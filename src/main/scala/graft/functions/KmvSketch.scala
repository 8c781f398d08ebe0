package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable KMV buffer: up to k distinct hashes in a primitive double
  * array, kept sorted ascending. Insert is binary-search + `arraycopy`
  * shift (O(log k) search, O(k) worst-case shift but the common full-buffer
  * case is a single comparison against `arr(n-1)` and an immediate return);
  * merge is a two-pointer sorted-union truncation, O(k). The round-5
  * implementation (an immutable `Seq` with `contains` + full re-sort per
  * accepted hash) made `q_kmv_distinct` the suite's slowest query; this is
  * the same primitive-buffer treatment [[ExactPercentiles]] gives
  * `percentile()`.
  */
final class KmvState(val arr: Array[Double], var n: Int) {

  /** Insert a hash, keeping the k smallest DISTINCT values. */
  def insert(h: Double): Unit = {
    val k = arr.length
    // full buffer and h at-or-beyond the horizon: no change (the common case
    // once a group has seen ~k distinct hashes — one branch, no search)
    if (n == k && h >= arr(n - 1)) return
    val idx = java.util.Arrays.binarySearch(arr, 0, n, h)
    if (idx >= 0) return // DISTINCT hashes: duplicates don't re-count
    val ins = -idx - 1
    if (n < k) {
      System.arraycopy(arr, ins, arr, ins + 1, n - ins)
      n += 1
    } else {
      // full: the largest value falls off the end
      System.arraycopy(arr, ins, arr, ins + 1, k - 1 - ins)
    }
    arr(ins) = h
  }

  /** Sorted distinct union of two states, truncated to k. */
  def mergeWith(o: KmvState): KmvState = {
    val k   = arr.length
    val out = new Array[Double](k)
    var i = 0; var j = 0; var m = 0
    while (m < k && (i < n || j < o.n)) {
      val takeLeft = j >= o.n || (i < n && arr(i) <= o.arr(j))
      val h        = if (takeLeft) arr(i) else o.arr(j)
      if (takeLeft) i += 1 else j += 1
      if (m == 0 || out(m - 1) != h) { out(m) = h; m += 1 }
    }
    new KmvState(out, m)
  }

  def toSeq: Seq[Double] = arr.take(n).toSeq
}

/** KMV (k-minimum-values) distinct sketch — the theta-sketch family's
  * simplest member (Pinot serves the same estimator class as
  * DISTINCTCOUNTTHETASKETCH; Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * Keep the k smallest DISTINCT uniform hashes of the values; if fewer than
  * k are seen the sketch is exact (it holds every distinct hash), otherwise
  * estimate = (k-1) / h_(k) — the k-th smallest hash of a uniform [0,1)
  * sample pins down the density. Standard error ~ 1/sqrt(k-2) (~6.3% at
  * k=256).
  *
  * This aggregate returns the SKETCH (the sorted hash array), not the
  * estimate: the estimate ([[KmvSketch.estimate]]) and the set-operation
  * estimates ([[KmvSketch.intersectColumns]]) are then plain codegen'd
  * column expressions over the array, and one aggregation output serves
  * both `q_kmv_distinct` and `q_kmv_intersect`.
  *
  * Why this exists next to the native HLL pair (`q_hll_sketch`): KMV's
  * estimate is a pure order statistic of engine-reproducible md5 hashes, so
  * — uniquely among the sketches here — the DuckDB oracle can recompute it
  * EXACTLY (hash-match, not rows-only): the caller feeds
  * `md5-prefix/2^32` doubles and the oracle takes `row_number() <= k` over
  * the same distinct hashes. And unlike HLL, a KMV sketch supports set
  * INTERSECTION estimates (via the Jaccard of merged sketches), which is
  * the theta-sketch capability HLL lacks.
  *
  * Scale: a [[TypedImperativeAggregate]], so it participates in partial
  * aggregation — map tasks keep at most k unboxed doubles per group, the
  * shuffle carries O(groups x k x partitions), and merge is an O(k)
  * two-pointer union. Same network math as [[TopK]].
  */
case class KmvHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvState]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"kmv_hashes expects double, got ${child.dataType.sql}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_hashes needs k >= 2, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KmvState = new KmvState(new Array[Double](k), 0)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = buf.mergeWith(other)

  override def eval(buf: KmvState): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = buf.arr(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val arr = new Array[Double](k)
    var i = 0
    while (i < n) { arr(i) = bb.getDouble; i += 1 }
    new KmvState(arr, n)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = false
  override def prettyName: String = "kmv_hashes"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvHashes =
    copy(child = newChild)
}

object KmvSketch {

  /** Registry builder: `kmv_hashes(hash_double, k)` with a foldable k. */
  def build(exprs: Seq[Expression]): Expression = {
    Arity.require("kmv_hashes", "2 (kmv_hashes(hash_double, k))", exprs, 2, 2)
    val kExpr = exprs(1)
    require(kExpr.foldable, "kmv_hashes k must be a literal")
    KmvHashes(exprs.head, kExpr.eval().asInstanceOf[Number].intValue())
  }

  /** Registry builder: `kmv_estimate(hashes_array, k)` — the estimator as a
    * composed builtin expression tree (If/Size/Divide/ElementAt), so plain
    * SQL can finish what `kmv_hashes` starts without any library call:
    * `SELECT kmv_estimate(kmv_hashes(h, 256), 256)`. No custom Expression
    * class needed; everything stays codegen'd.
    */
  def estimateBuild(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    Arity.require("kmv_estimate", "2 (kmv_estimate(hashes_array, k))", exprs, 2, 2)
    val kExpr = exprs(1)
    require(kExpr.foldable, "kmv_estimate k must be a literal")
    val k      = kExpr.eval().asInstanceOf[Number].intValue()
    val hashes = exprs.head
    If(
      LessThan(Size(hashes), Literal(k)),
      Cast(Size(hashes), org.apache.spark.sql.types.DoubleType),
      Divide(Literal((k - 1).toDouble), ElementAt(hashes, Literal(k)))
    )
  }

  /** Shared trees for the SQL set-operation estimators — the
    * composed-builtin twin of [[intersectColumns]] (same shapes: the
    * union's k smallest hashes, membership in both sketches, order-statistic
    * union estimate). Subtrees repeat (arrays are <= k doubles, and
    * whole-stage codegen's subexpression elimination collapses them), so
    * plain SQL can run theta set operations with no library call:
    * `SELECT kmv_jaccard(a, b, 256), kmv_intersect_est(a, b, 256)`.
    */
  private def setOpTrees(fn: String, exprs: Seq[Expression]): (Expression, Expression, Expression) = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.DoubleType
    Arity.require(fn, s"3 ($fn(a_hashes, b_hashes, k))", exprs, 3, 3)
    val kExpr = exprs(2)
    require(kExpr.foldable, s"$fn k must be a literal")
    val k = kExpr.eval().asInstanceOf[Number].intValue()
    val a = exprs(0)
    val b = exprs(1)
    val unionTopK = Slice(SortArray(ArrayUnion(a, b), Literal(true)), Literal(1), Literal(k))
    val nU        = Size(unionTopK)
    val nBoth     = Size(ArrayIntersect(unionTopK, ArrayIntersect(a, b)))
    // Two empty sketches make jaccard 0/0, which non-ANSI Divide turns into
    // NULL — but the driver-side twin intersectionEstimate returns 0.0 for
    // an empty union, and the estimators must agree. Define J(∅,∅) = 0.
    val jaccard = If(
      EqualTo(nU, Literal(0)),
      Literal(0.0),
      Divide(Cast(nBoth, DoubleType), Cast(nU, DoubleType))
    )
    val unionEst = If(
      LessThan(nU, Literal(k)),
      Cast(nU, DoubleType),
      Divide(Literal((k - 1).toDouble), ElementAt(unionTopK, Literal(k)))
    )
    (jaccard, unionEst, Multiply(jaccard, unionEst))
  }

  def jaccardBuild(exprs: Seq[Expression]): Expression      = setOpTrees("kmv_jaccard", exprs)._1
  def unionEstBuild(exprs: Seq[Expression]): Expression     = setOpTrees("kmv_union_est", exprs)._2
  def intersectEstBuild(exprs: Seq[Expression]): Expression = setOpTrees("kmv_intersect_est", exprs)._3

  /** Register `kmv_hashes(h, k)` + `kmv_estimate(arr, k)` + the set-op
    * estimators (`kmv_jaccard` / `kmv_union_est` / `kmv_intersect_est`) for
    * `expr(...)`/SQL use. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("kmv_hashes", build, "built-in")
    reg.createOrReplaceTempFunction("kmv_estimate", estimateBuild, "built-in")
    reg.createOrReplaceTempFunction("kmv_jaccard", jaccardBuild, "built-in")
    reg.createOrReplaceTempFunction("kmv_union_est", unionEstBuild, "built-in")
    reg.createOrReplaceTempFunction("kmv_intersect_est", intersectEstBuild, "built-in")
  }

  /** Distinct-count estimate from a sketch array: exact below k (the sketch
    * holds every distinct hash), (k-1)/h_(k) at k. Pure builtin expressions
    * — stays inside whole-stage codegen.
    */
  def estimate(hashes: Column, k: Int): Column =
    when(size(hashes) < k, size(hashes).cast("double"))
      .otherwise(lit((k - 1).toDouble) / element_at(hashes, k))

  /** Set-operation estimate columns from two sketch arrays (the
    * theta-sketch capability HLL lacks): among the k smallest hashes of the
    * union, the fraction present in BOTH sketches estimates the Jaccard
    * similarity, and jaccard x union-estimate gives |A ∩ B| (Beyer et al.
    * 2007 §5). Returns (jaccard, union_est, intersection_est) — all pure
    * builtin array expressions, no UDF.
    */
  def intersectColumns(a: Column, b: Column, k: Int): (Column, Column, Column) = {
    val unionTopK = slice(array_sort(array_union(a, b)), 1, k)
    val nBoth     = size(array_intersect(unionTopK, array_intersect(a, b)))
    // J(∅,∅) = 0, matching setOpTrees and intersectionEstimate — a bare
    // 0/0 Divide would yield NULL under non-ANSI semantics.
    val jaccard = when(size(unionTopK) === 0, 0.0)
      .otherwise(nBoth.cast("double") / size(unionTopK))
    val unionEst = estimate(unionTopK, k)
    (jaccard, unionEst, jaccard * unionEst)
  }

  /** Driver-side twin of [[intersectColumns]] over plain hash seqs (unit
    * tests / non-Spark callers). Returns (jaccard_est, intersection_est).
    */
  def intersectionEstimate(a: Seq[Double], b: Seq[Double], k: Int): (Double, Double) = {
    val union = (a ++ b).distinct.sorted.take(k)
    val aSet  = a.toSet
    val bSet  = b.toSet
    val both  = union.count(h => aSet(h) && bSet(h))
    val jaccard  = if (union.isEmpty) 0.0 else both.toDouble / union.size
    val unionEst = if (union.size < k) union.size.toDouble else (k - 1).toDouble / union.last
    (jaccard, jaccard * unionEst)
  }

  /** A-NOT-B estimate columns — the third theta-sketch set operation
    * (DataSketches `AnotB`; Pinot `DISTINCTCOUNTRAWTHETASKETCH` exposes it
    * as SET_DIFF). Same estimator family as [[intersectColumns]]: the k
    * smallest union hashes are a uniform sample of A ∪ B, so the fraction
    * of them that lie in A but NOT in B estimates |A \ B| / |A ∪ B|, and
    * multiplying by the union estimate gives |A \ B|. Membership is
    * decidable inside the sample window: every union-top-k hash is below
    * BOTH sketches' retention horizons (each sketch keeps its k smallest,
    * and the union top-k is bounded by min of the two k-th values whenever
    * the window is full), so "not in sketch B" there means "not in B".
    * Pure builtin array expressions — stays in codegen, oracle-recomputable.
    * Returns (a_only_frac, a_not_b_est).
    */
  def aNotBColumns(a: Column, b: Column, k: Int): (Column, Column) = {
    val unionTopK = slice(array_sort(array_union(a, b)), 1, k)
    val nAOnly    = size(array_intersect(unionTopK, array_except(a, b)))
    val frac = when(size(unionTopK) === 0, 0.0)
      .otherwise(nAOnly.cast("double") / size(unionTopK))
    (frac, frac * estimate(unionTopK, k))
  }

  /** Driver-side twin of [[aNotBColumns]]: (a_only_frac, a_not_b_est). */
  def aNotBEstimate(a: Seq[Double], b: Seq[Double], k: Int): (Double, Double) = {
    val union = (a ++ b).distinct.sorted.take(k)
    val bSet  = b.toSet
    val aSet  = a.toSet
    val only  = union.count(h => aSet(h) && !bSet(h))
    val frac     = if (union.isEmpty) 0.0 else only.toDouble / union.size
    val unionEst = if (union.size < k) union.size.toDouble else (k - 1).toDouble / union.last
    (frac, frac * unionEst)
  }
}
