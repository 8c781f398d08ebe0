package graft.streaming

import graft.Tables
import graft.operators.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming tokenizer retraining — the tokenizer twin of
  * [[StreamingGraph]]: arriving documents fold into a durable
  * DISTINCT-SEQUENCE FREQUENCY store per micro-batch, and FIVE corpus
  * artifacts a training pipeline ships — the BPE merge table, the
  * WordPiece likelihood-ratio merge table, the Unigram-LM vocab (all
  * three production tokenizer families), the TextRank keyword prior,
  * and the 4-row duplication spectrum — are retrained from the ONE
  * shared store and atomically republished behind a single version flip
  * after every fold (the StreamingCoPurchase tables-behind-one-pointer
  * shape; frequency tables are additive, so each retrain is
  * bit-identical to the batch build on the union corpus).
  *
  * Why this is cheap: the frequency table is ADDITIVE — batch k
  * contributes its own (text, count) partial, and the union's
  * re-aggregation `groupBy(text).sum(w)` is exactly the table a batch
  * build over the whole landed corpus would produce. Training on it
  * ([[Bpe.trainMerges]] consumes weighted counts) is therefore
  * BIT-IDENTICAL to the from-scratch batch derivation — the
  * retrain-equals-batch discipline every streaming twin here pins — and
  * per-fold training cost is vocabulary-shaped (the frequency-table
  * formulation's whole point), not corpus-shaped.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * bpeDir/
  *   _CURRENT          # live merge-table version
  *   freq/
  *     batch_id=3/     # one (s, w) partial per micro-batch, idempotent
  *   merges/
  *     v=2/            # (round, a, b, n) learned BPE merge table
  *   wordpiece/
  *     v=2/            # (round, a, b, n, na, nb, score) WordPiece table
  *   textrank/
  *     v=2/            # (node, s) TextRank keyword prior
  *   unigram/
  *     v=2/            # (g, n, c, li) Unigram-LM vocab with scores
  *   dupspectrum/
  *     v=2/            # 4-row duplication spectrum (n, totals, dup_frac)
  * }}}
  */
object StreamingBpe {

  /** Live merge-table version, or None before the first fold; heals a torn
    * pointer flip forward (same rule as [[StreamingGraph]]/[[StreamingIvf]]).
    */
  private[graft] def currentVersion(spark: SparkSession, bpeDir: String): Option[Int] =
    Snapshots.currentVersion(spark, bpeDir, "streaming bpe")

  /** Start the ingest stream: arriving parquet files of (doc_id, text)
    * rows land as one idempotent `batch_id=N` frequency partial, then the
    * merge table retrains over the accumulated (re-aggregated) frequency
    * store and republishes under the next version.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      bpeDir: String,
      checkpoint: String,
      rounds: Int = 6,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("doc_id BIGINT, text STRING")
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // space-padded sequences, the trainer's convention (merge
          // patterns are ' a b '-anchored)
          batch
            .groupBy(concat(lit(" "), col("text"), lit(" ")).as("s"))
            .agg(count(lit(1)).as("w"))
            .write
            .mode("overwrite")
            .parquet(s"$bpeDir/freq/batch_id=$batchId")
          // additive fold: re-aggregating the batch partials IS the
          // frequency table of the whole landed corpus (sums of sums are
          // the same totals), so training on it is bit-identical to the
          // batch build
          val freq = s.read
            .option("basePath", s"$bpeDir/freq")
            .parquet(s"$bpeDir/freq")
            .groupBy(col("s"))
            .agg(sum(col("w")).as("w"))
          // one pinned copy PER trainer: each weighted loop reclaims its
          // generation-0 frame after the first rewrite, so sharing one pin
          // would hand the second trainer deleted checkpoint blocks
          val pinnedFreq       = Tables.pin(freq)
          val pinnedFreqWp     = Tables.pin(freq)
          val pinnedFreqTr     = Tables.pin(freq)
          val pinnedFreqUg     = Tables.pin(freq)
          val (merges, mkPins) = Bpe.trainMergesWeightedTracked(pinnedFreq, rounds)
          val (wpMerges, wpPins) =
            graft.operators.WordPiece.trainWordPieceWeightedTracked(pinnedFreqWp, rounds)
          val v = currentVersion(s, bpeDir).getOrElse(0) + 1
          merges.write.mode("overwrite").parquet(s"$bpeDir/merges/v=$v")
          wpMerges.write.mode("overwrite").parquet(s"$bpeDir/wordpiece/v=$v")
          val (trScores, trPins) =
            graft.operators.TextAnalysis.buildTextrankFromFreqTracked(pinnedFreqTr)
          trScores.write.mode("overwrite").parquet(s"$bpeDir/textrank/v=$v")
          // the THIRD tokenizer family retrains from the same store (the
          // unigram hard-EM consumes the weighted frequency frame
          // directly — frequency tables are additive, so this equals the
          // batch build on the union corpus bit for bit)
          val (ugVocab, ugPins) =
            graft.operators.Unigram.trainUnigramWeightedTracked(pinnedFreqUg)
          ugVocab.write.mode("overwrite").parquet(s"$bpeDir/unigram/v=$v")
          // ...and so does the duplication spectrum: per-width (n, digest)
          // gram counts are additive over the distinct-sequence table, so
          // the 4-row spectrum folds per batch at vocabulary-shaped cost
          graft.operators.TextAnalysis
            .dupSpectrumFromFreq(freq)
            .write
            .mode("overwrite")
            .parquet(s"$bpeDir/dupspectrum/v=$v")
          val root = new org.apache.hadoop.fs.Path(bpeDir)
          val fs   = Snapshots.fsOf(s, root)
          Snapshots.writeCurrent(fs, root, v, "streaming bpe")
          // retain ONE prior version: a concurrent reader that resolved
          // merges() against v-1 just before the flip still holds a lazy
          // scan over its files — deleting v-1 immediately would fail that
          // read mid-flight, so reclaim v-2 instead (readers are expected
          // while the stream runs, unlike StreamingIvf.retrain's quiesced
          // protocol)
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$bpeDir/merges/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$bpeDir/wordpiece/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$bpeDir/textrank/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$bpeDir/unigram/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$bpeDir/dupspectrum/v=${v - 2}"), true)
            ()
          }
          // the merges parquet is written: the per-round argmax pins and
          // the folded frequency frame have no further consumer — reclaim
          // them so a long-running stream holds O(1) checkpoint
          // generations, the StreamingGraph tracked-pins discipline
          (mkPins ++ wpPins ++ trPins ++ ugPins ++
            Seq(pinnedFreq, pinnedFreqWp, pinnedFreqTr, pinnedFreqUg))
            .foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live BPE merge table (round, a, b, n) — bit-identical to
    * [[Bpe.trainMerges]] over the union of every landed batch.
    */
  def merges(spark: SparkSession, bpeDir: String): DataFrame = {
    val v = currentVersion(spark, bpeDir).getOrElse(
      throw new IllegalStateException(s"no published merge table under $bpeDir (stream has not folded yet)"))
    spark.read.parquet(s"$bpeDir/merges/v=$v")
  }

  /** The live WordPiece merge table (round, a, b, n, na, nb, score) —
    * bit-identical to [[graft.operators.WordPiece.trainWordPiece]] over
    * the union of every landed batch, published behind the SAME version
    * pointer as the BPE table (one flip covers both tokenizers).
    */
  def wordpieceMerges(spark: SparkSession, bpeDir: String): DataFrame = {
    val v = currentVersion(spark, bpeDir).getOrElse(
      throw new IllegalStateException(s"no published wordpiece table under $bpeDir (stream has not folded yet)"))
    spark.read.parquet(requireTable(spark, bpeDir, "wordpiece", v))
  }

  /** The pointer covers every table the fold publishes, but a `_CURRENT`
    * written by a pre-wordpiece/pre-textrank build points at a version
    * whose newer table dirs never materialized — the raw parquet read
    * would fail with an opaque path-not-found instead of saying what's
    * wrong (the [[StreamingGraph.trust]] seedless-stream rule).
    */
  private def requireTable(spark: SparkSession, bpeDir: String, table: String, v: Int): String = {
    val path = new org.apache.hadoop.fs.Path(s"$bpeDir/$table/v=$v")
    if (!Snapshots.fsOf(spark, path).exists(path))
      throw new IllegalStateException(
        s"no $table table at $path: version v=$v was published before $table was part of " +
          "the fold — wait for the next fold (or re-ingest) to publish it")
    path.toString
  }

  /** The live TextRank keyword prior (node, s in 1e-12 units) —
    * bit-identical to [[graft.operators.TextAnalysis.buildTextrankTracked]]
    * over the union of every landed batch, behind the same pointer.
    */
  def textrank(spark: SparkSession, bpeDir: String): DataFrame = {
    val v = currentVersion(spark, bpeDir).getOrElse(
      throw new IllegalStateException(s"no published textrank table under $bpeDir (stream has not folded yet)"))
    spark.read.parquet(requireTable(spark, bpeDir, "textrank", v))
  }

  /** The live Unigram-LM vocab (g, n, c, li) — bit-identical to
    * [[graft.operators.Unigram.trainUnigram]] over the union of every
    * landed batch, behind the same pointer (the third tokenizer family
    * from the one frequency store).
    */
  def unigramVocab(spark: SparkSession, bpeDir: String): DataFrame = {
    val v = currentVersion(spark, bpeDir).getOrElse(
      throw new IllegalStateException(s"no published unigram table under $bpeDir (stream has not folded yet)"))
    spark.read.parquet(requireTable(spark, bpeDir, "unigram", v))
  }

  /** The live 4-row duplication spectrum — bit-identical to
    * `q_text_dup_spectrum` over the union of every landed batch, behind
    * the same pointer: the pre-dedup diagnostic a curation pipeline
    * watches as data arrives.
    */
  def dupSpectrum(spark: SparkSession, bpeDir: String): DataFrame = {
    val v = currentVersion(spark, bpeDir).getOrElse(
      throw new IllegalStateException(s"no published dupspectrum table under $bpeDir (stream has not folded yet)"))
    spark.read.parquet(requireTable(spark, bpeDir, "dupspectrum", v))
  }
}
