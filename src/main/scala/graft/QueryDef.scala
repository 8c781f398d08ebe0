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
  /** decimal-exact sum of a double column, emitted as double: the sum itself
    * is an exact decimal (order-independent, identical in Spark and DuckDB),
    * and the final double conversion is correctly rounded on both engines.
    *
    * The output type must NOT be decimal: the driver's compare reads the
    * Spark parquet via pandas (decimals stay `Decimal` with fixed scale,
    * e.g. "919.60") but the DuckDB oracle via `.df()` (decimals become
    * float64, "919.6") — a decimal output column can never hash-match.
    * Same for DuckDB HUGEINT (int sums): always cast oracle int sums to
    * bigint. [[sumDec]] and [[sumDecSql]] are the two renderings of the ONE
    * oracle-parity convention — change them together.
    */
  def sumDec(c: org.apache.spark.sql.Column, scale: Int = 4): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** DuckDB twin of [[sumDec]]. The varchar bridge matters: DuckDB's direct
    * int128->double cast double-rounds once the scaled value exceeds 2^53,
    * while string parsing is correctly rounded like Spark's BigDecimal path.
    */
  def sumDecSql(col: String, scale: Int = 4): String =
    s"cast(cast(sum(cast($col as decimal(18,$scale))) as varchar) as double)"
}
