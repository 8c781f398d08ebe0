package graft.streaming

import graft.Tables
import graft.operators.NaiveBayes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming Naive Bayes retrain — the classifier twin of
  * [[StreamingBpe]]: arriving LABELED documents fold into a durable
  * per-class distinct-text frequency store per micro-batch, and the
  * trained model (class-token parameters + per-class priors/defaults)
  * retrains from the accumulated store and republishes behind one
  * [[Snapshots]] `_CURRENT` flip — the router/quality classifier a
  * curation pipeline keeps current as labeled data arrives.
  *
  * Why the fold is exact: every NB parameter is a pure function of
  * ADDITIVE counts — class doc counts, class-token occurrence counts,
  * the training vocabulary set — so re-aggregating the per-batch
  * (lang, s, w) partials IS the labeled frequency table of the whole
  * landed corpus, and [[NaiveBayes.modelWeighted]] over it is
  * BIT-IDENTICAL to the batch trainer on the union (spec-pinned, with
  * restart continuity). Per-fold training cost is
  * vocabulary-shaped + |distinct texts|, never |corpus|.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * nbDir/
  *   _CURRENT            # live model version
  *   freq/batch_id=3/    # one (lang, s, w) partial per micro-batch
  *   model/v=2/          # (lang, tok, c, s) class-token parameters
  *   classes/v=2/        # (lang, ndc, prior_s, dflt) per-class row
  * }}}
  */
object StreamingNb {

  /** Live model version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, nbDir: String): Option[Int] =
    Snapshots.currentVersion(spark, nbDir, "streaming nb")

  /** Start the ingest stream over arriving parquet (doc_id, text, lang)
    * rows; each batch lands one idempotent frequency partial, then the
    * model retrains over the accumulated store and republishes.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      nbDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("doc_id BIGINT, text STRING, lang STRING")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch
            .groupBy(col("lang"), col("text").as("s"))
            .agg(count(lit(1)).as("w"))
            .write
            .mode("overwrite")
            .parquet(s"$nbDir/freq/batch_id=$batchId")
          // additive fold: sums of per-batch sums ARE the union's counts
          val freq = Tables.pin(
            s.read
              .option("basePath", s"$nbDir/freq")
              .parquet(s"$nbDir/freq")
              .groupBy(col("lang"), col("s"))
              .agg(sum(col("w")).as("w")))
          val (scores, defaults, priors) = NaiveBayes.modelWeighted(freq)
          val v = currentVersion(s, nbDir).getOrElse(0) + 1
          scores.write.mode("overwrite").parquet(s"$nbDir/model/v=$v")
          priors
            .join(defaults, "lang")
            .select(col("lang"), col("ndc"), col("prior_s"), col("dflt"))
            .write
            .mode("overwrite")
            .parquet(s"$nbDir/classes/v=$v")
          val root = new org.apache.hadoop.fs.Path(nbDir)
          val fs   = Snapshots.fsOf(s, root)
          Snapshots.writeCurrent(fs, root, v, "streaming nb")
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$nbDir/model/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$nbDir/classes/v=${v - 2}"), true)
            ()
          }
          Tables.unpin(freq)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live class-token parameter table (lang, tok, c, s) —
    * bit-identical to the batch [[NaiveBayes]] trainer over the union of
    * every landed labeled doc.
    */
  def model(spark: SparkSession, nbDir: String): DataFrame = {
    val v = currentVersion(spark, nbDir).getOrElse(
      throw new IllegalStateException(s"no published model under $nbDir (stream has not folded yet)"))
    spark.read.parquet(s"$nbDir/model/v=$v")
  }

  /** The live per-class row (lang, ndc, prior_s, dflt), behind the same
    * pointer as the parameter table (one flip covers the whole model).
    */
  def classes(spark: SparkSession, nbDir: String): DataFrame = {
    val v = currentVersion(spark, nbDir).getOrElse(
      throw new IllegalStateException(s"no published model under $nbDir (stream has not folded yet)"))
    spark.read.parquet(s"$nbDir/classes/v=$v")
  }
}
