package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) corpus ingest/egress — the de-facto
  * interchange format of LLM training-data pipelines; the upstream side of
  * the parquet fixtures every operator here consumes.
  *
  * The reference's decode discipline ([[JsonDecode]], from
  * `PulsarJSONMessageDecoder.java:61-73`: externally supplied schema,
  * malformed records dropped-never-failed, sparse records keep nulls)
  * applies at corpus granularity, plus the rules a 100 TB read needs:
  *
  *   - EXPLICIT schema, never inference: schemaless `spark.read.json`
  *     scans the ENTIRE input once just to infer types — a full extra
  *     pass before any real work. Here the schema is a required input and
  *     the read is `spark.read.text` + `from_json`: one pass, whole-stage
  *     codegen, predicate/projection pruning intact.
  *   - drop-on-malformed is measurable, not silent: [[readCounted]] keeps
  *     the `_corrupt` flag for `observe()`/aggregation before the filter
  *     (the no-silent-caps rule), [[read]] drops.
  *   - egress ([[write]]) bounds file counts like the parquet sinks —
  *     `repartition(n)` round-robin, not `coalesce` (which would also cap
  *     the upstream compute parallelism).
  */
object JsonlCorpus {

  /** The `documents` fixture schema — the default corpus record shape. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** Read a JSONL corpus against an explicit schema, dropping malformed
    * lines (blank lines included — `from_json` yields a null struct for
    * empty input).
    */
  def read(spark: SparkSession, path: String, schema: StructType = documentsSchema): DataFrame =
    JsonDecode.decode(spark.read.text(path), "value", schema, schema.fieldNames.toSeq)

  /** Like [[read]] but keeps every line with a `_corrupt` flag instead of
    * dropping, so ingestion can count its losses:
    * `readCounted(...).observe("ingest", sum(when($"_corrupt", 1L)))`.
    */
  def readCounted(spark: SparkSession, path: String, schema: StructType = documentsSchema): DataFrame =
    JsonDecode.decodeCounted(spark.read.text(path), "value", schema, schema.fieldNames.toSeq)

  /** Write a frame as JSONL in `nFiles` files (Spark's json sink is
    * line-delimited by construction). Null fields are omitted per line —
    * the usual JSONL sparse-record convention, and exactly what [[read]]
    * turns back into nulls.
    */
  def write(df: DataFrame, path: String, nFiles: Int = 1): Unit =
    df.repartition(nFiles).write.mode(SaveMode.Overwrite).json(path)

  /** Streaming twin of [[read]] — the arrival-format story the reference
    * (a streaming ingester, `PulsarPartitionLevelConsumer.java:87-166`)
    * gives events, applied to the corpus layer: a file-source `readStream`
    * where each newly landed JSONL file becomes a micro-batch through the
    * SAME explicit-schema decode path as batch (no inference pass, no
    * separate code to drift). `maxFilesPerTrigger` bounds per-batch work —
    * the knob that keeps a backlogged 100 TB landing zone from becoming
    * one giant first batch.
    */
  def readStream(
      spark: SparkSession,
      path: String,
      schema: StructType = documentsSchema,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame =
    JsonDecode.decode(streamingLines(spark, path, maxFilesPerTrigger), "value", schema, schema.fieldNames.toSeq)

  /** Streaming twin of [[readCounted]]: keeps the `_corrupt` flag so the
    * stream can account for its drops (e.g. aggregate or `observe()` per
    * micro-batch) — drop-on-malformed stays measurable in flight, not just
    * at rest.
    */
  def readStreamCounted(
      spark: SparkSession,
      path: String,
      schema: StructType = documentsSchema,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame =
    JsonDecode.decodeCounted(streamingLines(spark, path, maxFilesPerTrigger), "value", schema, schema.fieldNames.toSeq)

  private def streamingLines(
      spark: SparkSession,
      path: String,
      maxFilesPerTrigger: Option[Int]
  ): DataFrame = {
    val reader = spark.readStream.format("text")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(path)
  }
}
