package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The library's `SparkSessionExtensions` hook — build-rule path (c): a
  * user adds
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every graft native expression is available in SQL on every session
  * of the cluster, with no per-session `register(...)` calls (the reference
  * host loads its decoder plugin by class name the same way,
  * `PulsarJSONMessageDecoder` via `PluginManager` —
  * `PulsarJSONMessageDecoder.java:50-57`).
  *
  * Injected at extension time (catalog-level, survives
  * `SparkSession.newSession()`) rather than via the temp-function registry
  * the per-session `register` helpers use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Arity gate: a builder reached with the wrong argument count must raise
    * an analysis-time error naming the expected signature, not leak an
    * `IndexOutOfBoundsException` (or silently build a degenerate call like
    * `exact_percentiles(x)` with zero percentages).
    */
  private def requireArity(name: String, signature: String, exprs: Seq[Expression], min: Int, max: Int = Int.MaxValue): Unit =
    if (exprs.length < min || exprs.length > max)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum"  -> signature,
          "actualNum"    -> exprs.length.toString,
          "docroot"      -> "https://spark.apache.org/docs/latest"
        )
      )

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(
          classOf[functions.CosineSimilarity].getName,
          "cosine_sim",
          "cosine_sim(a, b) - cosine similarity of two float vectors (fused codegen loop)"
        ),
        (exprs: Seq[Expression]) => {
          requireArity("cosine_sim", "2 (cosine_sim(a, b))", exprs, 2, 2)
          functions.CosineSimilarity(exprs(0), exprs(1))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("exact_percentiles"),
        new ExpressionInfo(
          classOf[functions.ExactPercentiles].getName,
          "exact_percentiles",
          "exact_percentiles(x, p...) - exact interpolated percentiles over a primitive buffer (unboxed percentile())"
        ),
        (exprs: Seq[Expression]) => {
          requireArity("exact_percentiles", ">= 2 (exact_percentiles(x, p1[, p2, ...]))", exprs, 2)
          functions.ExactPercentiles.build(exprs)
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(
          classOf[functions.RollingHash].getName,
          "rolling_hash",
          "rolling_hash(s) - 64-bit polynomial rolling hash of a string (codegen)"
        ),
        (exprs: Seq[Expression]) => {
          requireArity("rolling_hash", "1 (rolling_hash(s))", exprs, 1, 1)
          functions.RollingHash(exprs.head)
        }
      )
    )
  }
}
