package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arity gate for every graft function builder.
  *
  * A builder reached with the wrong argument count must raise an
  * analysis-time `AnalysisException` naming the expected signature — never an
  * `IllegalArgumentException` from a `require`, an `IndexOutOfBoundsException`
  * from raw indexing, or a silently-degenerate call (e.g.
  * `exact_percentiles(x)` with zero percentages). Both entry points — the
  * `SparkSessionExtensions` injection in `graft.GraftExtensions` and the
  * per-session `register()` temp-function helpers — go through the same
  * builders, so the guarantee holds regardless of registration order (a
  * later `register()` replacing the extension-injected builder keeps the
  * same error contract).
  */
object Arity {

  def require(name: String, signature: String, exprs: Seq[Expression], min: Int, max: Int = Int.MaxValue): Unit =
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
}
