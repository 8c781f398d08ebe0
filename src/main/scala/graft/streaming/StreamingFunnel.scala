package graft.streaming

import graft.Tables
import graft.operators.TextAnalysis
import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CORPUS-FUNNEL twin — the last batch gate family to get a
  * streaming counterpart: maintains `q_corpus_funnel`'s stage census AND
  * `q_corpus_ledger`'s per-doc drop trail under document arrivals,
  * republishing both behind one atomic `_CURRENT` flip.
  *
  * STAGE-BY-STAGE incrementality (each stage folds at the cheapest shape
  * its semantics allow — the r19 verdict's split applied per stage):
  *
  *   - QUALITY is a pure per-row rule: scored ONCE at landing (the
  *     `pass_q` flag travels with the landed row), never recomputed. A
  *     batch's quality drops are final the moment it lands.
  *   - EXACT DEDUP (keep-min-id per normalized fingerprint) folds through
  *     an ADDITIVE DIGEST STORE: each batch lands its (fp, min-id-in-
  *     batch) partial — fp computed once, map-side, at landing — and the
  *     fold's survivor set is one min-merge over the fp-shaped partials
  *     (the [[StreamingNb]] frequency-store discipline; min is
  *     associative, so a re-aggregated union of partials equals the batch
  *     build exactly). Text never moves for this stage.
  *   - SEMANTIC + NEAR-DUP re-derive per fold over the exact survivors —
  *     the [[StreamingSemDedup]] argument verbatim: their keys (k-means
  *     cluster pairs, MinHash band buckets over the surviving SET) are
  *     trained/corpus-relative, so no per-batch partial is exact. The
  *     fold calls the SAME [[CorpusPipeline.tailDropsTracked]] body the
  *     batch ledger artifact builds from, making the published tables
  *     BIT-IDENTICAL BY CONSTRUCTION to the batch gate on the union
  *     (spec-pinned, with restart continuity).
  *
  * `foldEvery` sets the re-derivation cadence (landing and the additive
  * partials are per-batch regardless); between folds readers serve the
  * previous exact version.
  *
  * The embedding frame and its trained cluster assignment are
  * PARAMETERS, fixed for the stream's lifetime (the [[StreamingCommunity]]
  * seeds convention): documents stream, their embeddings are a side
  * lookup — the batch gate passes the same `ivf_assignments` artifact.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * funDir/
  *   _CURRENT             # live version pointer
  *   docs/batch_id=3/     # (doc_id, text, pass_q, fp) landed arrivals
  *   fp/batch_id=3/       # (fp, min_id) additive exact-dedup partials
  *   stats/batch_id=3     # {batch_rows, dup_doc_ids, store_rows, pass_q_rows, folded}
  *   funnel/v=2/          # the 8-row stage census (q_corpus_funnel's table)
  *   ledger/v=2/          # the per-doc drop trail (q_corpus_ledger's table)
  * }}}
  * Exactly-once per doc_id is enforced the [[StreamingDbscan]] way
  * (within-batch dedup + anti-join of earlier landed ids, own dir
  * excluded for replay idempotence); re-deliveries surface as
  * `dup_doc_ids`. Cumulative counters fold additively from the prior
  * stats record — no store-sized count() jobs per micro-batch.
  */
object StreamingFunnel {

  /** Live version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, funDir: String): Option[Int] =
    Snapshots.currentVersion(spark, funDir, "streaming funnel")

  /** Start the ingest stream over arriving parquet (doc_id, text) rows.
    * `emb`/`a2` are the embedding frame and its trained cluster
    * assignment (fixed side inputs); thresholds default to the
    * `q_corpus_funnel` gate constants.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      funDir: String,
      checkpoint: String,
      emb: DataFrame,
      a2: DataFrame,
      minQuality: Double = 0.3,
      semanticThreshold: Double = 0.4,
      maxFilesPerTrigger: Option[Int] = None,
      foldEvery: Int = 1
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(foldEvery >= 1, s"foldEvery must be >= 1, got $foldEvery")
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s    = batch.sparkSession
          val root = new org.apache.hadoop.fs.Path(funDir)
          val fs   = Snapshots.fsOf(s, root)
          val docsBase = new org.apache.hadoop.fs.Path(s"$funDir/docs")
          val deduped  = Tables.pin(batch.dropDuplicates("doc_id").toDF())
          val fresh = Tables.pin(
            (if (fs.exists(docsBase))
               deduped.join(
                 s.read
                   .option("basePath", s"$funDir/docs")
                   .parquet(s"$funDir/docs")
                   .filter(col("batch_id") =!= batchId)
                   .select(col("doc_id")),
                 Seq("doc_id"),
                 "left_anti")
             else deduped)
              .select(col("doc_id"), col("text")))
          // quality + fingerprint computed ONCE, map-side, at landing —
          // the per-row halves of the funnel never run again
          TextAnalysis
            .qualityFrame(fresh)
            .select(
              col("doc_id"),
              col("text"),
              (col("quality") >= minQuality).as("pass_q"),
              md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
            .write
            .mode("overwrite")
            .parquet(s"$funDir/docs/batch_id=$batchId")
          val landed     = Tables.pin(s.read.parquet(s"$funDir/docs/batch_id=$batchId"))
          val batchRows  = landed.count()
          val batchPassQ = landed.filter(col("pass_q")).count()
          // the exact-dedup ADDITIVE partial: (fp, min id in batch) over
          // quality-pass rows — fp-shaped, min-merge associative
          landed
            .filter(col("pass_q"))
            .groupBy(col("fp"))
            .agg(min(col("doc_id")).as("min_id"))
            .write
            .mode("overwrite")
            .parquet(s"$funDir/fp/batch_id=$batchId")
          val statsDir = new org.apache.hadoop.fs.Path(s"$funDir/stats")
          fs.mkdirs(statsDir)
          val storeRows = Snapshots.priorStatsField(fs, statsDir, batchId, "store_rows", 0L) + batchRows
          val passQRows =
            Snapshots.priorStatsField(fs, statsDir, batchId, "pass_q_rows", 0L) + batchPassQ
          val doFold = (batchId + 1) % foldEvery == 0
          if (doFold) {
            val docsStore = Tables.pin(
              s.read
                .option("basePath", s"$funDir/docs")
                .parquet(s"$funDir/docs")
                .select(col("doc_id"), col("text"), col("pass_q"), col("fp")))
            // min-merge of the fp partials: the global keep-min survivor
            // per fingerprint (never touches text)
            val keepers = s.read
              .option("basePath", s"$funDir/fp")
              .parquet(s"$funDir/fp")
              .groupBy(col("fp"))
              .agg(min(col("min_id")).as("_keep_id"))
            val exact = Tables.pin(
              docsStore
                .join(keepers.select(col("_keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
                .select(col("doc_id"), col("text")))
            // the SAME tail body the batch ledger artifact builds from
            val (tailLedger, tPins) =
              CorpusPipeline.tailDropsTracked(exact, emb, a2, semanticThreshold)
            val dropQ = docsStore
              .filter(!col("pass_q"))
              .select(
                col("doc_id"),
                lit("2_dropped_quality").as("stage"),
                lit(s"quality<$minQuality").as("reason"))
            val dropE = docsStore
              .filter(col("pass_q"))
              .join(keepers, "fp")
              .filter(col("doc_id") =!= col("_keep_id"))
              .select(
                col("doc_id"),
                lit("3_dropped_exact").as("stage"),
                concat(lit("dup_of:"), col("_keep_id")).as("reason"))
            val ledger = Tables.pin(dropQ.unionByName(dropE).unionByName(tailLedger))
            val census = CorpusPipeline.censusFromLedger(docsStore.select(col("doc_id")), ledger)
            val v      = currentVersion(s, funDir).getOrElse(0) + 1
            census.write.mode("overwrite").parquet(s"$funDir/funnel/v=$v")
            ledger.write.mode("overwrite").parquet(s"$funDir/ledger/v=$v")
            Snapshots.writeCurrent(fs, root, v, "streaming funnel")
            if (v > 2) {
              fs.delete(new org.apache.hadoop.fs.Path(s"$funDir/funnel/v=${v - 2}"), true)
              fs.delete(new org.apache.hadoop.fs.Path(s"$funDir/ledger/v=${v - 2}"), true)
              ()
            }
            (tPins ++ Seq(docsStore, exact, ledger)).foreach(Tables.unpin)
          }
          val statsJson =
            s"""{"batch_id":$batchId,"batch_rows":$batchRows,""" +
              s""""dup_doc_ids":${deduped.count() - batchRows},""" +
              s""""store_rows":$storeRows,"pass_q_rows":$passQRows,"folded":$doFold}"""
          val statsOut = fs.create(new org.apache.hadoop.fs.Path(statsDir, s"batch_id=$batchId"), true)
          try statsOut.write(statsJson.getBytes("UTF-8"))
          finally statsOut.close()
          Seq(fresh, deduped, landed).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  private def readCurrent(spark: SparkSession, funDir: String, table: String): DataFrame = {
    val v = currentVersion(spark, funDir).getOrElse(
      throw new IllegalStateException(s"no published $table under $funDir (stream has not folded yet)"))
    spark.read.parquet(s"$funDir/$table/v=$v")
  }

  /** The live stage census — bit-identical to
    * [[CorpusPipeline.funnelCensusTracked]] (the `q_corpus_funnel` body)
    * on the union of every landed document.
    */
  def census(spark: SparkSession, funDir: String): DataFrame =
    readCurrent(spark, funDir, "funnel").orderBy(col("stage"))

  /** The live drop ledger — bit-identical to
    * [[CorpusPipeline.funnelLedgerTracked]] (the `q_corpus_ledger` body)
    * on the union.
    */
  def ledger(spark: SparkSession, funDir: String): DataFrame =
    readCurrent(spark, funDir, "ledger").orderBy(col("doc_id"))
}
