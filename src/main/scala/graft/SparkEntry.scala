package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's [[QueryDef]]s into the three maps the
  * driver consumes. Each query key appears in `queries`; keys whose result is
  * ANSI-SQL-expressible also appear in `oracleSql` for the DuckDB compare.
  */
object SparkEntry {

  /** All operator queries, in module order (SURVEY §2 inventory). */
  val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Relational2.defs ++
      operators.Events.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Quantize.defs ++
      operators.TextAnalysis.defs ++
      operators.Multimodal.defs ++
      operators.SourceQueries.defs ++
      operators.Profiling.defs ++
      operators.IvfSimilarity.defs ++
      operators.Analytics.defs ++
      operators.StarTree.defs ++
      operators.Graph.defs ++
      operators.Dsir.defs ++
      operators.TimeSeries.defs ++
      operators.Bpe.defs ++
      operators.PackSequences.defs ++
      operators.WordPiece.defs ++
      operators.Unigram.defs ++
      operators.NaiveBayes.defs ++
      pipelines.CorpusPipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The complete reference pipeline: graft-events DSv2 partitioned scan ->
    * JSON decode (drop-on-malformed) -> relational aggregation
    * (SURVEY §7.3) — the reference's whole reason to exist, end to end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_source_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
