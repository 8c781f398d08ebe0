package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-level Shannon entropy (nats) of a string in ONE map-side pass:
  * `H = ln(n) - sum(c * ln(c)) / n` over the per-codepoint counts.
  *
  * This is the codegen'd collapse of the relational formulation
  * (explode(split(text, '')) -> count per char -> decimal-cast sum), which
  * materializes one ROW PER CHARACTER before the partial aggregate — at
  * corpus scale that is the single most expensive way to read a histogram.
  * The expression keeps the pipeline map-only (no Generate, no per-char
  * rows) while reproducing the relational arithmetic BIT-FOR-BIT so the
  * DuckDB oracle still hash-matches:
  *
  *   - characters are Unicode code points, matching both engines'
  *     `split(text, '')` semantics; the empty string behaves like Spark's
  *     `split` (one empty token: n=1, H=0);
  *   - each `c * ln(c)` term goes through the exact semantics of Spark's
  *     `Cast(double -> decimal(18,12))` — shortest-repr `BigDecimal.valueOf`
  *     then HALF_UP at scale 12 — and the terms are summed as exact
  *     decimals (order-free), because that is precisely what the relational
  *     form's `sum(cast(... as decimal(18,12)))` computes;
  *   - the final division happens in doubles after one decimal->double
  *     conversion, matching `clc.cast("double") / n`.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_entropy expects string, got ${child.dataType.sql}")

  def entropyOf(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0 // split('') -> one empty token: ln(1) - 0
    // ASCII fast path + spill map for the rest
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val cell = other.computeIfAbsent(cp, _ => new Array[Long](1))
        cell(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    var clc = JBigDecimal.ZERO
    def term(c: Long): JBigDecimal =
      // Spark Cast(double -> decimal(18,12)): shortest-repr BigDecimal of
      // the double, HALF_UP at scale 12. StrictMath.log, not Math.log:
      // Spark's Log expression evaluates through StrictMath, and the two
      // differ by an ulp on some inputs — which breaks the bit-for-bit
      // identity with the relational form (observed on the fixtures)
      JBigDecimal.valueOf(c.toDouble * StrictMath.log(c.toDouble)).setScale(12, RoundingMode.HALF_UP)
    var j = 0
    while (j < 128) {
      if (ascii(j) > 1) clc = clc.add(term(ascii(j))) // c=1 contributes 0
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > 1) clc = clc.add(term(c))
      }
    }
    StrictMath.log(n.toDouble) - clc.doubleValue() / n.toDouble
  }

  override def nullSafeEval(v: Any): Any = entropyOf(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => {
        val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
        s"$ref.entropyOf($c)"
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  /** Arity-checked builder shared by `GraftExtensions` and `register`. */
  def builder(exprs: Seq[Expression]): Expression = {
    Arity.require("char_entropy", "1 (char_entropy(s))", exprs, 1, 1)
    CharEntropy(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy",
      builder,
      "built-in"
    )
}
