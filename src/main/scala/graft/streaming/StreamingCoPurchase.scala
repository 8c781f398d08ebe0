package graft.streaming

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming weighted co-purchase analytics — the WEIGHTED-graph streaming
  * twin, completing the discipline [[StreamingGraph]] set for the
  * bipartite purchase graph: arriving (order, part) basket rows fold into
  * a durable store per micro-batch, the thresholded weighted co-purchase
  * edge set re-derives over the accumulated DISTINCT baskets, and BOTH
  * weighted artifacts the batch queries serve — the tie-strength-weighted
  * PageRank score table (`q_graph_pagerank_weighted`) and the settled
  * SSSP trust-distance table (`q_graph_sssp`) — are republished behind
  * one atomic version flip.
  *
  * Layout — the versioned-snapshot shape shared with
  * [[StreamingGraph]]/[[StreamingIvf]]:
  * {{{
  * coDir/
  *   _CURRENT              # live version pointer (torn flips heal forward)
  *   baskets/batch_id=7/   # distinct (o, p) rows, one dir per micro-batch
  *   wpr/v=3/              # weighted PageRank (node, s in 1e-12 units)
  *   sssp/v=3/             # settled shortest paths (node, d)
  * }}}
  * Batch dirs are idempotent overwrites; a reader never sees a
  * half-written table (both v=N+1 dirs materialize before the flip) nor
  * tables from different versions (one pointer covers both); ONE prior
  * version is retained for in-flight readers (v−2 is what gets
  * reclaimed — the retain-one rule).
  *
  * DETERMINISM over warm-start: each fold re-runs
  * [[Graph.coPurchaseEdgesWeightedFrom]] → the full fixed-point /
  * relaxation loops from their uniform inits on the accumulated basket
  * set, so the published tables are BIT-IDENTICAL to a from-scratch batch
  * build on the union corpus (spec-pinned) — weight w is a COUNT over the
  * accumulated distinct baskets, so the fold's weights are exactly the
  * union's weights; an incremental +=delta on w would be exact too, but
  * the capped basket explode makes the recount the simpler invariant to
  * prove. Every pinned intermediate (accumulated baskets, the shared
  * weighted edge frame, the builders' tracked pins, the settled distance
  * frame) is reclaimed once the version's parquet is written: a
  * long-running stream holds O(1) checkpoint generations.
  */
object StreamingCoPurchase {

  /** Live version, or None before the first fold — the shared
    * [[Snapshots]] pointer protocol (torn flips heal forward).
    */
  private[graft] def currentVersion(spark: SparkSession, coDir: String): Option[Int] =
    Snapshots.currentVersion(spark, coDir, "streaming co-purchase")

  /** Start the ingest stream over arriving parquet files of (o, p) basket
    * rows. Per micro-batch: one idempotent `batch_id=N` dir, then the
    * weighted edge set re-derives over the accumulated DISTINCT baskets
    * (through the shared capped basket explode — the no-silent-blowups
    * generator) and both weighted tables republish under the next version.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      coDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("o BIGINT, p BIGINT")
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch
            .select(col("o"), col("p"))
            .distinct()
            .write
            .mode("overwrite")
            .parquet(s"$coDir/baskets/batch_id=$batchId")
          // cross-batch distinct: a basket row arriving twice is ONE
          // (order, part) fact, so w stays the union corpus's count
          val baskets = Tables.pin(
            s.read
              .option("basePath", s"$coDir/baskets")
              .parquet(s"$coDir/baskets")
              .select(col("o"), col("p"))
              .distinct()
          )
          // ONE weighted-edge materialization feeds both builders (each
          // would otherwise re-run the capped basket explode)
          val ew             = Tables.pin(Graph.coPurchaseEdgesWeightedFrom(baskets))
          val (scores, pins) = Graph.buildWeightedPagerankScoresTracked(ew)
          val v              = currentVersion(s, coDir).getOrElse(0) + 1
          scores.write.mode("overwrite").parquet(s"$coDir/wpr/v=$v")
          val dist = Graph.ssspFrom(ew)
          dist.write.mode("overwrite").parquet(s"$coDir/sssp/v=$v")
          val root = new org.apache.hadoop.fs.Path(coDir)
          val fs   = Snapshots.fsOf(s, root)
          Snapshots.writeCurrent(fs, root, v, "streaming co-purchase")
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$coDir/wpr/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$coDir/sssp/v=${v - 2}"), true)
            ()
          }
          (pins ++ Seq(dist, ew, baskets)).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live weighted-PageRank table (node, s in 1e-12 units) —
    * bit-identical to [[Graph.buildWeightedPagerankScores]] over the
    * weighted edges of every landed basket.
    */
  def weightedScores(spark: SparkSession, coDir: String): DataFrame = {
    val v = currentVersion(spark, coDir).getOrElse(
      throw new IllegalStateException(s"no published wpr table under $coDir (stream has not folded yet)"))
    spark.read.parquet(s"$coDir/wpr/v=$v")
  }

  /** The live settled-distance table (node, d) — bit-identical to
    * [[Graph.ssspFrom]] over the same weighted edges.
    */
  def distances(spark: SparkSession, coDir: String): DataFrame = {
    val v = currentVersion(spark, coDir).getOrElse(
      throw new IllegalStateException(s"no published sssp table under $coDir (stream has not folded yet)"))
    spark.read.parquet(s"$coDir/sssp/v=$v")
  }
}
