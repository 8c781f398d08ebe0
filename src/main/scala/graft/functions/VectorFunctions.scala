package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions allocate a
  * lambda frame per element and fall out of the tight loop the JIT can
  * vectorize; a brute-force top-k at 100 TB is dominated by exactly this
  * inner product, so it gets a fused single-pass loop (dot, |a|², |b|² in one
  * traversal) — preference order (b) of the build rules: custom Expression
  * before UDF.
  *
  * Accumulation is strictly left-to-right in element order, which keeps the
  * result bit-compatible with the SQL formulation
  * `sum(a[i]*b[i]) / (sqrt(sum(a[i]^2)) * sqrt(sum(b[i]^2)))` used by the
  * DuckDB oracle (both round to 6 decimals at the output).
  *
  * Null handling matches built-in binary expressions: null if either array
  * is null; null elements contribute 0. A zero-norm (or empty) array yields
  * null — the same value Spark's non-ANSI Divide and the DuckDB oracle
  * produce for the SQL spelling's 0/0 — never NaN, which would sort ABOVE
  * every real score under `desc` and top a similarity top-k.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})"
      )
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      val yv = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = $a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i);
           |  double $yv = $b.isNullAt($i) ? 0.0 : (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |if ($na == 0.0 || $nb == 0.0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine over two `array<bigint>` int8-code columns ([[graft.operators.Quantize]])
  * as a fused codegen loop — the quantized twin of [[CosineSimilarity]].
  *
  * Integer dot and norms accumulate in longs (EXACT: codes are |q| <= 127,
  * so dim 64 sums stay far inside int64), one double division at the end —
  * bit-identical to the SQL formulation
  * `sum(qa*qb) / (sqrt(sum(qa^2)) * sqrt(sum(qb^2)))` the DuckDB oracle
  * runs, while replacing the CodegenFallback `aggregate(zip_with(...))`
  * higher-order pair (a lambda frame per element, three separate array
  * traversals) with one JIT-friendly loop. At 100 TB the SQ8 scan is this
  * inner product and nothing else.
  *
  * Zero-norm codes (empty arrays, or the all-zero codes the scale clamp
  * produces for a zero vector) yield null — matching the SQL spelling under
  * non-ANSI Divide and DuckDB — never NaN.
  */
case class QuantizedCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"quantized_cosine expects (array<bigint>, array<bigint>), got (${left.dataType.sql}, ${right.dataType.sql})"
      )
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0L else x.getLong(i)
      val yv = if (y.isNullAt(i)) 0L else y.getLong(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    // All-zero codes (the scale clamp quantizes a zero vector to exactly
    // this) must NOT produce NaN: NaN sorts above every real score under
    // `desc` and would top quantizedTopK. Null matches non-ANSI Divide and
    // the DuckDB oracle's 0/0.
    if (na == 0L || nb == 0L) null
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $dot = 0L, $na = 0L, $nb = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $xv = $a.isNullAt($i) ? 0L : $a.getLong($i);
           |  long $yv = $b.isNullAt($i) ? 0L : $b.getLong($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |if ($na == 0L || $nb == 0L) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = (double) $dot / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Arity-checked builder shared by `GraftExtensions` and `register`. */
  def cosineBuilder(exprs: Seq[Expression]): Expression = {
    Arity.require("cosine_sim", "2 (cosine_sim(a, b))", exprs, 2, 2)
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Arity-checked builder for [[QuantizedCosine]]. */
  def quantizedCosineBuilder(exprs: Seq[Expression]): Expression = {
    Arity.require("quantized_cosine", "2 (quantized_cosine(qa, qb))", exprs, 2, 2)
    QuantizedCosine(exprs(0), exprs(1))
  }

  /** Register `cosine_sim(a, b)` and `quantized_cosine(qa, qb)` in the
    * session's function registry so they are usable from `expr(...)` / SQL.
    * Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      cosineBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantized_cosine",
      quantizedCosineBuilder,
      "built-in"
    )
  }
}
