package graft.pipelines

import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition every
  * operator in this library exists to serve, wired as ONE lazy plan per
  * stage so Catalyst prunes/pushes across stage boundaries:
  *
  *   raw documents
  *     -> quality filter   (map-side score, drop below threshold)
  *     -> exact dedup      (normalized-fingerprint, keep smallest doc_id)
  *     -> near-dup dedup   (MinHash/LSH candidate pairs -> connected
  *                          components -> keep cluster representative)
  *     -> split assignment (deterministic content-hash 80/10/10)
  *     -> partitioned write (hive layout by split, salted file counts)
  *     -> small-files compaction (optional: rewrite each split to
  *                          ~targetBytes files via [[Sinks.compact]],
  *                          swap in place, layout preserved)
  *
  * Scale notes: the quality filter and fingerprinting are map-only; exact
  * dedup is one shuffle on the fingerprint; the near-dup stage is the
  * bucket-grouped LSH pattern (shuffle volume bounded by band-bucket
  * sizes, never a doc x doc self-join); survivors join back via a
  * broadcast when the cluster-label frame is small (non-duplicate corpora)
  * and a key shuffle otherwise — Catalyst/AQE picks. Every stage is
  * deterministic: re-running the pipeline reproduces byte-identical
  * splits and file assignment (the property eval-reproducibility audits
  * need).
  *
  * Returns the per-stage row accounting so callers can assert
  * conservation: n_in = n_dropped_quality + n_dropped_exact +
  * n_dropped_neardup + n_out.
  */
object CorpusPipeline {

  final case class Stats(
      nIn: Long,
      nDroppedQuality: Long,
      nDroppedExact: Long,
      nDroppedNearDup: Long,
      nOut: Long
  )

  def run(
      docs: DataFrame,
      outPath: String,
      minQuality: Double = 0.3,
      filesPerSplit: Int = 2,
      compactTargetBytes: Option[Long] = None
  ): Stats = {
    val nIn = docs.count()

    // 1. quality filter — map-side
    val scored  = TextAnalysis.qualityFrame(docs)
    val kept    = scored.filter(col("quality") >= minQuality).select(docs.columns.map(col): _*)
    val nKeptQ  = kept.count()

    // 2. exact dedup on the normalized fingerprint, keep smallest doc_id
    val fp = kept.withColumn("_fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
    val minPerFp = fp.groupBy(col("_fp")).agg(min(col("doc_id")).as("_keep_id"))
    val exact = fp
      .join(minPerFp, "_fp")
      .filter(col("doc_id") === col("_keep_id"))
      .drop("_fp", "_keep_id")
    val nExact = exact.count()

    // 3. near-dup dedup: LSH pairs -> components -> drop non-representatives
    val pairs  = Dedup.pairsFromSignatures(Dedup.signatures(exact))
    val labels = Dedup.clusters(pairs) // (doc_id, label = smallest id in component)
    val nearDup = exact
      .join(labels, Seq("doc_id"), "left_outer")
      .filter(col("label").isNull || col("label") === col("doc_id"))
      .drop("label")
    val nNear = nearDup.count()

    // 4. deterministic split assignment (same rule as q_split_assign)
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    val split = nearDup.withColumn(
      "split",
      when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )

    // 5. partitioned, sorted, size-bounded write
    Sinks.writePartitioned(split, outPath, Seq("split"), Seq("doc_id"), filesPerSplit)

    // 6. optional small-files compaction, per split partition. A corpus
    // assembled by many writers (or a streaming sink) fragments into
    // file counts governed by writer parallelism, not data size; at 100 TB
    // that murders scan planning. Compaction rewrites each split subdir to
    // ~targetBytes files (actual on-disk sizing, Sinks.compact) and swaps
    // it in via rename, preserving the hive split=... layout. The rewrite
    // fully materializes before the delete, so a crash mid-compaction
    // leaves either the original subdir or the swapped one, never neither.
    compactTargetBytes.foreach { target =>
      val spark = docs.sparkSession
      val root  = new org.apache.hadoop.fs.Path(outPath)
      val fs    = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("split="))
        .foreach { st =>
          val tmp = new org.apache.hadoop.fs.Path(root, s".compact-tmp-${st.getPath.getName}")
          Sinks.compact(spark, st.getPath.toString, tmp.toString, target, Seq("doc_id"))
          fs.delete(st.getPath, true)
          fs.rename(tmp, st.getPath)
        }
    }

    Stats(
      nIn = nIn,
      nDroppedQuality = nIn - nKeptQ,
      nDroppedExact = nKeptQ - nExact,
      nDroppedNearDup = nExact - nNear,
      nOut = nNear
    )
  }
}
