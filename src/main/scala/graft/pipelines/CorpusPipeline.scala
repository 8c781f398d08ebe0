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
    val kept    = scored.filter(col("quality") >= minQuality).select(docs.columns.toIndexedSeq.map(col): _*)
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
    // it in via RENAME-ASIDE, preserving the hive split=... layout:
    //   1. compacted copy fully materializes at .compact-tmp-<name>;
    //   2. the ORIGINAL renames aside to .compact-old-<name>;
    //   3. the tmp copy renames into the live path;
    //   4. the aside copy is deleted last.
    // A crash at ANY point leaves at least one FULL copy of the split at a
    // predictable path: before step 2 the live dir is untouched; between
    // steps 2 and 3 the live path is briefly absent but the complete
    // original sits at .compact-old-<name> (and the complete compacted copy
    // at tmp); after step 3 the live dir is whole again. [[recoverAside]]
    // heals the between-renames state on the next run by renaming the aside
    // copy back; tmp/old dirs are dot-prefixed so parquet readers never see
    // them. Pinned by the torn-swap spec in CorpusPipelineSpec.
    compactTargetBytes.foreach { target =>
      val spark = docs.sparkSession
      val root  = new org.apache.hadoop.fs.Path(outPath)
      val fs    = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      recoverAside(fs, root)
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("split="))
        .foreach { st =>
          val name = st.getPath.getName
          val tmp  = new org.apache.hadoop.fs.Path(root, s".compact-tmp-$name")
          Sinks.compact(spark, st.getPath.toString, tmp.toString, target, Seq("doc_id"))
          swapIn(fs, st.getPath, tmp, new org.apache.hadoop.fs.Path(root, s".compact-old-$name"))
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

  /** Streaming form of the corpus ingest — the arrival path wired end to
    * end: a JSONL landing zone consumed file-by-file as micro-batches
    * ([[graft.sources.JsonlCorpus.readStream]]), malformed lines dropped
    * with per-batch `observe()` accounting (`corpus_ingest`: n_lines /
    * n_malformed — the no-silent-caps rule in flight), the same map-only
    * quality filter as [[run]], exact dedup ON ARRIVAL via
    * `dropDuplicatesWithinWatermark` over the normalized-text fingerprint,
    * deterministic split assignment, and an append-mode hive-partitioned
    * parquet sink.
    *
    * Scale/semantics notes:
    *   - dedup state is keyed by 16-byte fingerprint and bounded by
    *     `dedupHorizon` of PROCESSING time (`current_timestamp()` is
    *     evaluated once per micro-batch): a duplicate landing within the
    *     horizon is dropped, one landing later is kept — the arrival-window
    *     contract of streaming ingest, vs [[run]]'s global keep-smallest-id.
    *     Within the horizon the stream keeps the FIRST arrival; batch keeps
    *     the smallest doc_id — re-running [[run]] over the landed output
    *     reconciles the difference (and the near-dup stage, which needs
    *     cross-corpus connected components no incremental operator can
    *     provide, runs there too).
    *   - the parquet sink appends per micro-batch, so file counts grow with
    *     trigger count — exactly the fragmentation [[Sinks.compact]] plus
    *     the [[run]] swap protocol exist to repair on a schedule.
    *
    * Returns the started [[StreamingQuery]]; the caller owns its lifecycle.
    */
  def runStreaming(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      checkpoint: String,
      schema: org.apache.spark.sql.types.StructType = graft.sources.JsonlCorpus.documentsSchema,
      minQuality: Double = 0.3,
      dedupHorizon: String = "10 minutes",
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = graft.sources.JsonlCorpus
      .readStreamCounted(spark, inPath, schema, maxFilesPerTrigger)
      .observe(
        "corpus_ingest",
        count(lit(1)).as("n_lines"),
        // coalesce: a data-less micro-batch (watermark-only) reports sum()
        // as null, which would make the accounting unparseable downstream
        coalesce(sum(when(col("_corrupt"), 1L).otherwise(0L)), lit(0L)).as("n_malformed")
      )
      .filter(!col("_corrupt"))
      .drop("_corrupt")
    val kept = TextAnalysis
      .qualityFrame(raw)
      .filter(col("quality") >= minQuality)
      .select(raw.columns.toIndexedSeq.map(col): _*)
    val deduped = kept
      .withColumn("_fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("_arrival", current_timestamp())
      .withWatermark("_arrival", dedupHorizon)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp", "_arrival")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    deduped
      .withColumn(
        "split",
        when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
      )
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("split")
      .start()
  }

  /** Rename-aside swap: park the live dir at `aside`, promote `tmp` into the
    * live path, delete the parked copy last. Every intermediate state keeps a
    * full copy of the data at a predictable path (see the step-6 comment in
    * [[run]]). A stale `aside` from a previous crashed run whose live path
    * survived is deleted first so the park rename cannot collide.
    * `private[graft]` so the torn-swap spec can stop after the park rename
    * and assert recoverability.
    */
  private[graft] def swapIn(
      fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path,
      aside: org.apache.hadoop.fs.Path
  ): Unit = {
    if (fs.exists(aside)) fs.delete(aside, true)
    // Hadoop rename reports failure as FALSE, not an exception — unchecked,
    // a failed park rename would silently leave the compaction unapplied
    // (and a failed promote would mimic the crash state with no error).
    // Throwing surfaces it; the thrown-between-renames state is exactly the
    // recoverable one recoverAside() heals.
    require(fs.rename(live, aside), s"compaction swap: failed to park $live at $aside")
    require(fs.rename(tmp, live), s"compaction swap: failed to promote $tmp to $live (original parked at $aside)")
    fs.delete(aside, true)
  }

  /** Heal a swap torn between the two renames: any `.compact-old-<name>`
    * whose live `<name>` is missing is the complete pre-compaction original —
    * rename it back. If the live path exists the aside copy is redundant
    * (crash landed after the promote rename) and is dropped.
    */
  private[graft] def recoverAside(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path
  ): Unit =
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".compact-old-"))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(root, st.getPath.getName.stripPrefix(".compact-old-"))
        if (!fs.exists(live))
          require(fs.rename(st.getPath, live), s"recovery: failed to restore ${st.getPath} to $live")
        else fs.delete(st.getPath, true)
      }
}
