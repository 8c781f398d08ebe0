package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query.
  *
  * @param name   stable key — shows up in `SparkEntry.queries`, the driver's
  *               CORRECTNESS/BENCH reports, and Verify's output layout.
  * @param doc    which SURVEY §2 capability this covers.
  * @param build  the Spark-native implementation, `(session, sfDir) => df`.
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet (None => non-SQL-expressible, driver does a weaker
  *               rows-only check).
  *
  * Oracle-parity conventions used across all queries (see SCALE.md):
  *   - outputs are deterministically ordered (every ORDER BY ends in a
  *     unique key) and bounded (aggregated or LIMITed);
  *   - double SUMs are computed as exact decimal sums (`cast` before `sum`)
  *     so both engines produce the identical value regardless of addition
  *     order; averages divide an exact decimal numerator by an exact count;
  *   - remaining per-row double math is deterministic (same IEEE ops in the
  *     same order in both engines) or rounded to 4-6 decimals;
  *   - timestamps derived from the ns-precision events table are emitted as
  *     epoch seconds (long) to sidestep unit differences.
  */
final case class QueryDef(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** decimal-exact sum of a double column: identical in Spark and DuckDB.
    * [[sumDec]] and [[sumDecSql]] are the two renderings of the ONE
    * oracle-parity convention — change them together.
    */
  def sumDec(c: org.apache.spark.sql.Column, scale: Int = 4): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(c.cast(s"decimal(18,$scale)")).cast(s"decimal(38,$scale)")

  def sumDecSql(col: String, scale: Int = 4): String =
    s"cast(sum(cast($col as decimal(18,$scale))) as decimal(38,$scale))"
}
