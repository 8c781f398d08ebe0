package graft.streaming

import graft.Tables
import graft.operators.PackSequences
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SEQUENCE-PACKING twin — completes the streaming-counterpart
  * story for the packing family (`q_pack_sequences`): maintains the
  * per-lang packing census (sequences, boundary-split docs, pad tokens,
  * fill ppm) under document arrivals, republished behind one atomic
  * `_CURRENT` flip.
  *
  * Incrementality argument (the [[StreamingSemDedup]] split, applied to
  * packing): the census is NOT additive in arrivals — a new document
  * appended to a lang stream shifts every later document's `start`
  * position (the per-lang exclusive prefix sum), moving chunk boundaries
  * and therefore `n_split_docs` / `pad_tokens` for the whole stream. So
  * each fold RE-DERIVES the census over the accumulated landed store
  * through the SAME [[PackSequences.censusFrame]] body the batch gate
  * runs, which makes the published table bit-identical BY CONSTRUCTION
  * to the batch build on the union (spec-pinned, with restart
  * continuity). Only `total_tokens`/`n_docs` would fold additively —
  * publishing an exact census means re-running the prefix sum, which is
  * one window over doc-count-shaped rows per lang, NOT per-token work
  * (the [[PackSequences]] scale note).
  *
  * The merge table is a PARAMETER, frozen for the stream's lifetime
  * (the [[StreamingFunnel]] side-input convention): a tokenizer is
  * trained once and applied to arrivals; retraining it is a new stream
  * version, not a fold.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * packDir/
  *   _CURRENT             # live version pointer
  *   docs/batch_id=3/     # (doc_id, lang, text) landed arrivals
  *   stats/batch_id=3     # {batch_rows, dup_doc_ids, store_rows, folded}
  *   census/v=2/          # the per-lang packing census (q_pack_sequences' table)
  * }}}
  * Exactly-once per doc_id is enforced the [[StreamingDbscan]] way
  * (within-batch dedup + anti-join of earlier landed ids, own dir
  * excluded for replay idempotence); re-deliveries surface as
  * `dup_doc_ids`. Cumulative counters fold additively from the prior
  * stats record — no store-sized count() jobs per micro-batch.
  * `foldEvery` sets the re-derivation cadence (landing is per-batch
  * regardless; between folds readers serve the previous exact version).
  */
object StreamingPack {

  /** Live version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, packDir: String): Option[Int] =
    Snapshots.currentVersion(spark, packDir, "streaming pack")

  /** Start the ingest stream over arriving parquet (doc_id, lang, text)
    * rows. `merges` is the frozen trained BPE merge table (round, a, b).
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      packDir: String,
      checkpoint: String,
      merges: DataFrame,
      seqLen: Int = PackSequences.SeqLen,
      maxFilesPerTrigger: Option[Int] = None,
      foldEvery: Int = 1
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(foldEvery >= 1, s"foldEvery must be >= 1, got $foldEvery")
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, lang STRING, text STRING")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s    = batch.sparkSession
          val root = new org.apache.hadoop.fs.Path(packDir)
          val fs   = Snapshots.fsOf(s, root)
          val docsBase = new org.apache.hadoop.fs.Path(s"$packDir/docs")
          // pinned: the anti-join runs once and its counts are block-local
          val deduped = Tables.pin(batch.dropDuplicates("doc_id").toDF())
          val fresh = Tables.pin(
            (if (fs.exists(docsBase))
               deduped.join(
                 s.read
                   .option("basePath", s"$packDir/docs")
                   .parquet(s"$packDir/docs")
                   .filter(col("batch_id") =!= batchId)
                   .select(col("doc_id")),
                 Seq("doc_id"),
                 "left_anti")
             else deduped)
              .select(col("doc_id"), col("lang"), col("text")))
          fresh.write
            .mode("overwrite")
            .parquet(s"$packDir/docs/batch_id=$batchId")
          val batchRows = fresh.count()
          // fold cadence: re-derivation every foldEvery-th batch on a
          // replay-stable batchId rule; landing is per-batch regardless
          val doFold = (batchId + 1) % foldEvery == 0
          val foldPins =
            if (!doFold) Seq.empty[DataFrame]
            else {
              val store = Tables.pin(
                s.read
                  .option("basePath", s"$packDir/docs")
                  .parquet(s"$packDir/docs")
                  .select(col("doc_id"), col("lang"), col("text")))
              // the SAME census body the batch gate runs, over the union
              val census = PackSequences.censusFrame(store, merges, seqLen)
              val v      = currentVersion(s, packDir).getOrElse(0) + 1
              census.write.mode("overwrite").parquet(s"$packDir/census/v=$v")
              Snapshots.writeCurrent(fs, root, v, "streaming pack")
              if (v > 2) {
                fs.delete(new org.apache.hadoop.fs.Path(s"$packDir/census/v=${v - 2}"), true)
                ()
              }
              Seq(store)
            }
          val statsDir = new org.apache.hadoop.fs.Path(s"$packDir/stats")
          fs.mkdirs(statsDir)
          // store_rows folds additively from the prior stats record —
          // exactly-once landing makes the store append-only in rows
          val storeRows =
            Snapshots.priorStatsField(fs, statsDir, batchId, "store_rows", 0L) + batchRows
          val statsJson =
            s"""{"batch_id":$batchId,"batch_rows":$batchRows,""" +
              s""""dup_doc_ids":${deduped.count() - batchRows},""" +
              s""""store_rows":$storeRows,"folded":$doFold}"""
          val statsOut = fs.create(new org.apache.hadoop.fs.Path(statsDir, s"batch_id=$batchId"), true)
          try statsOut.write(statsJson.getBytes("UTF-8"))
          finally statsOut.close()
          (foldPins ++ Seq(fresh, deduped)).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live per-lang packing census — bit-identical to
    * [[PackSequences.censusFrame]] (the `q_pack_sequences` body) on the
    * union of every landed document.
    */
  def census(spark: SparkSession, packDir: String): DataFrame = {
    val v = currentVersion(spark, packDir).getOrElse(
      throw new IllegalStateException(s"no published census under $packDir (stream has not folded yet)"))
    spark.read.parquet(s"$packDir/census/v=$v").orderBy(col("lang"))
  }
}
