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

  /** Bit-identical fast path for [[sumDec]] over CLEAN fixed-point doubles
    * (values that ARE `scale`-decimal rationals, like 2-decimal prices and
    * their ≤6-decimal products): scale to long map-side
    * (`floor(x*10^s + 0.5)` — pure codegen, no per-row BigDecimal), sum as
    * long (codegen long add), and convert ONCE at the end via an exact
    * decimal multiply so the final double is correctly rounded in a single
    * step (long->double->divide would double-round past 2^53).
    *
    * Equivalence argument: a clean value's double is within a few ulp of
    * the true rational r, so x*10^s lands within ~1e-4 of the integer
    * r*10^s — floor(+0.5) recovers it exactly, which is the same unscaled
    * long the decimal(18,s) cast produces. NOT valid for values with real
    * precision beyond `scale` (true rounding, ties possible) — q1-family
    * price sums only. Positive inputs assumed (floor(+0.5) is round-half-up
    * only for x >= 0).
    *
    * Scale ceiling: the long accumulator wraps at 9.2e18 — with scale 6
    * that is a 9.2e12 value-sum per group (~2.5e8 lineitem rows/group);
    * beyond that, partition the sum or fall back to [[sumDec]] (decimal
    * buffers escalate to int128-class exactness at any size).
    */
  def sumScaled(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{floor, lit, sum}
    (sum(floor(c * lit(math.pow(10, scale)) + lit(0.5))).cast("decimal(38,0)") *
      lit(java.math.BigDecimal.ONE.movePointLeft(scale))).cast("double")
  }
}
