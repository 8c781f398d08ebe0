package graft.streaming

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming PageRank — the graph family's streaming twin, completing the
  * pattern the engine already has for dedup ([[graft.pipelines
  * .CorpusPipeline.runStreamingNearDup]]), containment, IVF
  * ([[StreamingIvf]]), transitions and drift: arriving purchase-pair edges
  * fold into a durable edge store per micro-batch, and the domain-quality
  * score table (the PageRank artifact curation pipelines join against) is
  * re-derived and atomically republished after every fold.
  *
  * Layout — the [[StreamingIvf]] versioned-snapshot shape:
  * {{{
  * graphDir/
  *   _CURRENT            # text file holding the live scores version
  *   edges/
  *     batch_id=7/       # one dir of distinct (c, s) pairs per micro-batch
  *   scores/
  *     v=3/              # fixed-point integer PageRank (node, s)
  * }}}
  * Batch dirs are idempotent overwrites (a replayed batch rewrites its own
  * dir — the exactly-once pattern shared with the corpus pipeline), and a
  * reader never sees a half-written score table: `v=N+1` materializes
  * completely before the `_CURRENT` flip (torn flips heal forward, same
  * rule as the IVF pointer).
  *
  * DETERMINISM over warm-start: each fold re-runs the full fixed-point
  * loop from the uniform init on the accumulated DISTINCT edge set —
  * [[Graph.buildPagerankScores]], bit-exact integer arithmetic — so the
  * published table is IDENTICAL to a from-scratch batch build on the
  * union corpus (spec-pinned, the retrain-equals-batch-build discipline
  * of [[StreamingIvf]]). Warm-starting from the previous scores converges
  * to the same fixed point in 1-2 rounds for small deltas, but a
  * FIXED-iteration-count schedule started from a different init lands on
  * different bits — a twin that only approximately matches its batch
  * counterpart can't be hash-gated, so the deterministic schedule wins.
  * At 10^9 nodes the per-fold cost is the same one-shuffle-per-round loop
  * the batch query runs; a deployment that folds frequently would batch
  * arrivals (maxFilesPerTrigger) to amortize it.
  */
object StreamingGraph {

  /** Live scores version, or None before the first fold. Heals the
    * delete-then-rename window of [[writeCurrent]]: a crash there leaves
    * only `_CURRENT.tmp`, whose content is the fully-materialized new
    * version — promote it.
    */
  private[graft] def currentVersion(spark: SparkSession, graphDir: String): Option[Int] =
    Snapshots.currentVersion(spark, graphDir, "streaming graph")

  /** Start the ingest stream: arriving parquet files of (c, s) purchase
    * pairs land as one idempotent `batch_id=N` edge dir per micro-batch,
    * then the score table re-derives over the accumulated DISTINCT edge
    * set and republishes under the next version. Every pinned intermediate
    * (the accumulated pair frame plus the builder's tracked edge/node
    * pins) is reclaimed once the batch's score parquet is written — a
    * long-running stream holds O(1) checkpoint generations, not O(batches).
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      graphDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None,
      trustSeeds: Option[SparkSession => org.apache.spark.sql.DataFrame] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("c BIGINT, s BIGINT")
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch
            .select(col("c"), col("s"))
            .distinct()
            .write
            .mode("overwrite")
            .parquet(s"$graphDir/edges/batch_id=$batchId")
          // cross-batch distinct: the same pair arriving in two batches is
          // ONE edge (the batch query's source-side distinct, applied to
          // the accumulated store). Pinned — the symmetrizing union inside
          // the builder reads it twice.
          val pairs = Tables.pin(
            s.read
              .option("basePath", s"$graphDir/edges")
              .parquet(s"$graphDir/edges")
              .select(col("c"), col("s"))
              .distinct()
          )
          val (scores, pins) = Graph.buildPagerankScoresTracked(pairs)
          val v               = currentVersion(s, graphDir).getOrElse(0) + 1
          scores.write.mode("overwrite").parquet(s"$graphDir/scores/v=$v")
          // TrustRank shares the edge store and the same fixed-point
          // machinery: when a seed whitelist is configured, the fold
          // republishes the trust table too — one extra loop over the
          // already-landed edges, both tables covered by the SAME
          // _CURRENT flip (a reader never sees scores and trust from
          // different versions)
          val trustPins = trustSeeds.toSeq.flatMap { seedsOf =>
            val (trust, tp) = Graph.buildTrustrankScoresTracked(pairs, seedsOf(s))
            trust.write.mode("overwrite").parquet(s"$graphDir/trust/v=$v")
            tp
          }
          val root = new org.apache.hadoop.fs.Path(graphDir)
          val fs   = Snapshots.fsOf(s, root)
          Snapshots.writeCurrent(fs, root, v, "streaming graph")
          // retain ONE prior version: a reader that resolved scores()
          // against v-1 just before the flip still holds a lazy scan over
          // its files — reclaim v-2 instead of failing that read mid-flight
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$graphDir/scores/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$graphDir/trust/v=${v - 2}"), true)
            ()
          }
          (pins ++ trustPins :+ pairs).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live score table (node, s in 1e-12 units) — bit-identical to
    * [[Graph.buildPagerankScores]] over the union of every landed batch.
    */
  def scores(spark: SparkSession, graphDir: String): DataFrame = {
    val v = currentVersion(spark, graphDir).getOrElse(
      throw new IllegalStateException(s"no published scores under $graphDir (stream has not folded yet)"))
    spark.read.parquet(s"$graphDir/scores/v=$v")
  }

  /** The live TrustRank table (node, s) — published alongside the PageRank
    * scores when [[ingest]] was started with a seed whitelist;
    * bit-identical to [[Graph.buildTrustrankScoresTracked]] over the union
    * of every landed batch and that whitelist.
    */
  def trust(spark: SparkSession, graphDir: String): DataFrame = {
    val v = currentVersion(spark, graphDir).getOrElse(
      throw new IllegalStateException(s"no published trust table under $graphDir (stream has not folded yet)"))
    // the pointer covers BOTH tables, but the trust dir only materializes
    // when ingest() was started WITH a seed whitelist — on a seedless
    // stream (or one restarted seedless after a seeded run) the version
    // exists while trust/v=N does not, and the raw parquet read would fail
    // with an opaque path-not-found instead of saying what's wrong
    val path = new org.apache.hadoop.fs.Path(s"$graphDir/trust/v=$v")
    if (!Snapshots.fsOf(spark, path).exists(path))
      throw new IllegalStateException(
        s"no trust table at $path: the stream publishing v=$v was started " +
          "without trustSeeds — restart ingest() with a seed whitelist to publish TrustRank")
    spark.read.parquet(path.toString)
  }
}
