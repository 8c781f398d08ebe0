package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Growable primitive double buffer — the whole point of this aggregate.
  * Spark's built-in `percentile` buffers an `OpenHashMap[AnyRef, Long]`
  * (every update boxes the value, every merge reboxes the map, eval sorts
  * boxed keys); for near-unique doubles like prices the map buys nothing
  * and the boxing costs ~4 µs/row. This buffer appends unboxed doubles and
  * sorts primitives once at eval.
  */
final class DoubleVec(var arr: Array[Double], var n: Int) {
  def this() = this(new Array[Double](64), 0)
  def add(x: Double): Unit = {
    if (n == DoubleVec.MaxValues)
      throw new IllegalStateException(
        s"exact_percentiles group exceeds ${DoubleVec.MaxValues} non-null values; " +
          "a single group's values must fit one JVM array (use approx_percentile " +
          "for groups beyond that ceiling)"
      )
    if (n == arr.length) {
      val b = new Array[Double](arr.length << 1)
      System.arraycopy(arr, 0, b, 0, n)
      arr = b
    }
    arr(n) = x
    n += 1
  }
  def addAll(o: DoubleVec): Unit = {
    if (n.toLong + o.n > DoubleVec.MaxValues)
      throw new IllegalStateException(
        s"exact_percentiles group exceeds ${DoubleVec.MaxValues} non-null values; " +
          "a single group's values must fit one JVM array (use approx_percentile " +
          "for groups beyond that ceiling)"
      )
    if (n + o.n > arr.length) {
      val b = new Array[Double](math.max(arr.length << 1, n + o.n))
      System.arraycopy(arr, 0, b, 0, n)
      arr = b
    }
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
}

object DoubleVec {

  /** Per-group cardinality ceiling: the serialized form is `4 + 8 * n`
    * bytes in one byte array, so n beyond (Int.MaxValue - 4) / 8 would
    * overflow the Int allocation size (and the values themselves must fit
    * one JVM array). ~268M values ≈ 2 GiB per group — beyond that, exact
    * percentile-by-materialization is the wrong tool; fail with a clear
    * error instead of a negative-allocation crash.
    */
  val MaxValues: Int = (Int.MaxValue - 4) / 8
}

/** Exact interpolated percentiles over doubles, array-of-percentages form,
  * as a [[TypedImperativeAggregate]] with a primitive buffer.
  *
  * Semantics are bit-identical to Spark's built-in
  * `percentile(x, array(...))` (and so to DuckDB `quantile_cont`): null
  * inputs are skipped, position is `p * (n - 1)`, and the interpolation is
  * `(hi - pos) * v[lo] + (pos - lo) * v[hi]` — the same expression the
  * built-in evaluates, so swapping this in cannot move an oracle result.
  *
  * Like the built-in, it materializes the group's values (percentile is not
  * mergeable-in-constant-space); the win is constant-factor: unboxed
  * updates, `System.arraycopy` merges, one `java.util.Arrays.sort` of a
  * primitive array at eval (~3-5x end-to-end on a 600k-row scan). Partial
  * aggregation still applies — partitions serialize their vectors, not
  * rows.
  */
case class ExactPercentiles(
    child: Expression,
    percentages: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[DoubleVec]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"exact_percentiles expects double, got ${child.dataType.sql}")
    else if (!percentages.forall(p => p >= 0.0 && p <= 1.0))
      TypeCheckResult.TypeCheckFailure("percentages must be in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): DoubleVec = new DoubleVec()

  override def update(buf: DoubleVec, input: InternalRow): DoubleVec = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoubleVec, other: DoubleVec): DoubleVec = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: DoubleVec): Any = {
    if (buf.n == 0) return null
    java.util.Arrays.sort(buf.arr, 0, buf.n)
    val out = new Array[Any](percentages.length)
    var i = 0
    while (i < percentages.length) {
      val pos = percentages(i) * (buf.n - 1)
      val lo  = math.floor(pos).toInt
      val hi  = math.ceil(pos).toInt
      out(i) =
        if (lo == hi) buf.arr(lo)
        else (hi - pos) * buf.arr(lo) + (pos - lo) * buf.arr(hi)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: DoubleVec): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleVec = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val arr = new Array[Double](math.max(n, 64))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new DoubleVec(arr, n)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = true
  override def prettyName: String = "exact_percentiles"

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactPercentiles =
    copy(child = newChild)
}

object ExactPercentiles {

  /** Registry builder: `exact_percentiles(x, p1, p2, ...)` with foldable
    * percentage literals. Arity-checked (shared by `GraftExtensions` and
    * `register`): a bare `exact_percentiles(x)` would silently build with
    * zero percentages and return an empty array.
    */
  def build(exprs: Seq[Expression]): Expression = {
    Arity.require("exact_percentiles", ">= 2 (exact_percentiles(x, p1[, p2, ...]))", exprs, 2)
    ExactPercentiles(
      // numeric inputs cast up front (the built-in gets this from
      // ImplicitCastInputTypes, which is private[sql])
      if (exprs.head.dataType == DoubleType) exprs.head else Cast(exprs.head, DoubleType),
      exprs.tail.map { e =>
        require(e.foldable, "exact_percentiles percentages must be literals")
        e.eval() match {
          case d: java.lang.Number                    => d.doubleValue()
          case d: org.apache.spark.sql.types.Decimal  => d.toDouble
          case other => throw new IllegalArgumentException(s"not a numeric percentage: $other")
        }
      }
    )
  }

  /** Register `exact_percentiles(x, p...)` for `expr(...)`/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "exact_percentiles",
      build,
      "built-in"
    )
}
