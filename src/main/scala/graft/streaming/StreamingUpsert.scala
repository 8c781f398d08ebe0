package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming MERGE — the upsert-on-arrival dimension table, the streaming
  * twin of `q_merge_upsert` ([[graft.operators.Relational2]]): arriving
  * update rows land per micro-batch, the LATEST update per key wins, and
  * the merged dimension (base rows whose key never updated + the winning
  * update per key) republishes behind the shared [[Snapshots]] `_CURRENT`
  * protocol — the lakehouse MERGE INTO loop, run as a fold.
  *
  * Layout — the versioned-snapshot shape shared with
  * [[StreamingCoPurchase]]/[[StreamingGraph]]/[[StreamingIvf]]:
  * {{{
  * dimDir/
  *   _CURRENT              # live version pointer (torn flips heal forward)
  *   updates/batch_id=7/   # distinct update rows, one dir per micro-batch
  *   dim/v=3/              # the merged dimension table
  * }}}
  * Batch dirs are idempotent overwrites; a reader never sees a
  * half-written dimension (v=N+1 materializes fully before the flip); ONE
  * prior version is retained for in-flight readers (the retain-one rule).
  *
  * LATEST-WINS is deterministic: per key the winner is
  * `max(struct(batch_id, attrs...))` over the accumulated update dirs —
  * later batches strictly supersede earlier ones (batch_id leads the
  * struct), and re-deliveries inside one batch collapse by the attribute
  * tiebreak. DETERMINISM over warm-start: each fold re-derives the merge
  * from the base snapshot + ALL landed updates, so the published table is
  * BIT-IDENTICAL to a from-scratch batch MERGE with the same final update
  * set (spec-pinned) — the retrain-equals-batch-build discipline applied
  * to a dimension table. The per-fold cost is one key-shuffle over the
  * update store (update-sized, not corpus-sized) + one anti join against
  * the base (broadcast when the update set is small — AQE picks, exactly
  * as in the batch MERGE plan).
  */
object StreamingUpsert {

  private val Cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")

  /** Live version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, dimDir: String): Option[Int] =
    Snapshots.currentVersion(spark, dimDir, "streaming upsert")

  /** Start the upsert stream over arriving parquet update rows
    * (o_orderkey, o_orderstatus, o_totalprice). `baseDir` holds the
    * dimension's initial snapshot with the same schema.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      baseDir: String,
      dimDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch
            .select(Cols.map(col): _*)
            .distinct()
            .write
            .mode("overwrite")
            .parquet(s"$dimDir/updates/batch_id=$batchId")
          // latest-wins per key over the accumulated update store: the
          // batch_id partition column leads the argmax struct, so later
          // batches strictly supersede earlier ones
          val latest = Tables.pin(
            s.read
              .option("basePath", s"$dimDir/updates")
              .parquet(s"$dimDir/updates")
              .groupBy(col("o_orderkey"))
              .agg(max(struct(col("batch_id"), col("o_orderstatus"), col("o_totalprice"))).as("m"))
              .select(
                col("o_orderkey"),
                col("m.o_orderstatus").as("o_orderstatus"),
                col("m.o_totalprice").as("o_totalprice")
              )
          )
          // the batch MERGE plan: left-anti on the merge key ∪ updates
          val merged = s.read
            .parquet(baseDir)
            .select(Cols.map(col): _*)
            .join(latest.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
            .unionByName(latest)
          val v = currentVersion(s, dimDir).getOrElse(0) + 1
          merged.write.mode("overwrite").parquet(s"$dimDir/dim/v=$v")
          val root = new org.apache.hadoop.fs.Path(dimDir)
          val fs   = Snapshots.fsOf(s, root)
          Snapshots.writeCurrent(fs, root, v, "streaming upsert")
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$dimDir/dim/v=${v - 2}"), true)
            ()
          }
          Tables.unpin(latest)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live merged dimension — bit-identical to a batch MERGE of the
    * base snapshot with the latest-wins fold of every landed update.
    */
  def dimension(spark: SparkSession, dimDir: String): DataFrame = {
    val v = currentVersion(spark, dimDir).getOrElse(
      throw new IllegalStateException(s"no published dimension under $dimDir (stream has not folded yet)"))
    spark.read.parquet(s"$dimDir/dim/v=$v")
  }
}
