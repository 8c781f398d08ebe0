package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a MERGEABLE Spark
  * aggregate — the frequency-estimation sketch family (Pinot ships the
  * DataSketches frequent-items flavor as FREQUENTSTRINGSSKETCH; the
  * exact-output Misra-Gries path here is [[FreqItems]] — CMS is the
  * complementary POINT-QUERY shape: O(d*w) memory, any key probe-able
  * after the fact, estimate >= truth always).
  *
  * Division of labor (the [[KmvHashes]] pattern): the aggregate takes an
  * array of d PRE-COMPUTED bucket indices per row, one per hash row, and
  * only does counter mechanics. The bucket hashing lives in the query as
  * builtin md5/conv/% expressions — whole-stage-codegen'd on the Spark
  * side AND bit-reproducible by the DuckDB oracle, which recomputes the
  * identical counter grid relationally (group-by count + min over rows).
  * An engine-private hash (Murmur3) would have made every CMS query
  * rows-only; reproducible hashing makes a probabilistic sketch
  * hash-EXACT under the gate, like q_kmv_distinct / q_hll_md5.
  *
  * Scale shape: the aggregation buffer is one primitive `Array[Long]` of
  * d*w counters per partial; update is d in-place increments, merge is
  * element-wise add (counters are sums, so sketch-of-concat ==
  * merge-of-sketches EXACTLY — no truncation loss, unlike KMV/TopK).
  * A 1000-executor build ships one d*w*8-byte buffer per partition up
  * the tree, never the keys.
  *
  * The SERIALIZED sketch is self-describing (the [[BloomFilter]] lesson):
  * a 16-byte header — magic "GCM", version, depth int, width int, 3
  * reserved bytes — precedes the little-endian counters, and the probe
  * reads the geometry FROM the sketch. A build/probe geometry mismatch
  * therefore fails loudly instead of silently reading wrong cells. Only
  * the partial-buffer shuffle uses raw counter words (geometry is a plan
  * constant inside one aggregation tree).
  */
object CountMinSketch {

  val HeaderLen = 16
  private val Magic   = Array[Byte]('G', 'C', 'M')
  private val Version = 1.toByte

  /** depth*width is capped so one buffer stays comfortably inside an
    * executor's aggregation memory: 1<<22 cells = 32 MB of longs.
    */
  val MaxCells = 1 << 22

  def header(depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(Version).putInt(depth).putInt(width).put(Array[Byte](0, 0, 0, 0))
    bb.array()
  }

  /** (depth, width) recovered from a serialized sketch; throws on anything
    * that is not a version-1 graft CMS.
    */
  def geometryOf(bytes: Array[Byte]): (Int, Int) = {
    require(
      bytes.length >= HeaderLen &&
        bytes(0) == Magic(0) && bytes(1) == Magic(1) && bytes(2) == Magic(2),
      s"not a graft count-min sketch (len=${bytes.length})")
    require(bytes(3) == Version, s"unsupported CMS version ${bytes(3)} (expected $Version)")
    val bb    = java.nio.ByteBuffer.wrap(bytes, 4, 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val depth = bb.getInt
    val width = bb.getInt
    require(depth >= 1 && width >= 1 && depth.toLong * width <= MaxCells,
      s"corrupt CMS header: depth=$depth width=$width")
    require(bytes.length == HeaderLen + depth * width * 8,
      s"CMS length ${bytes.length} does not match header geometry ${depth}x$width")
    (depth, width)
  }

  def toBytes(counters: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(HeaderLen + counters.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(header(depth, width))
    counters.foreach(bb.putLong)
    bb.array()
  }

  def toRawBytes(counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(counters.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def fromRawBytes(bytes: Array[Byte]): Array[Long] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Point-query the SERIALIZED sketch: min over the d rows of the counter
    * at that row's bucket — the CMS estimate, >= the true count always
    * (counters only over-count on collisions). Shared verbatim by the
    * interpreted eval and (by name) the generated code. Bucket indices out
    * of [0, width) mean the probe was hashed with a different geometry
    * than the build — fail loudly.
    */
  def query(bytes: Array[Byte], buckets: ArrayData): Long = {
    val (depth, width) = geometryOf(bytes)
    require(buckets.numElements() == depth,
      s"CMS probe has ${buckets.numElements()} bucket indices, sketch depth is $depth")
    val bb  = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      require(!buckets.isNullAt(d), s"CMS probe bucket $d is null (nullable bucket expression?)")
      val b = buckets.getInt(d)
      require(b >= 0 && b < width, s"CMS probe bucket $b outside [0,$width)")
      val c = bb.getLong(HeaderLen + (d.toLong * width + b).toInt * 8)
      if (c < min) min = c
      d += 1
    }
    min
  }

  /** Inner-product estimate from two sketches of the SAME geometry
    * (Cormode & Muthukrishnan §4.2): min over the d rows of
    * sum_w a[d][w] * b[d][w]. The true inner product of the two key
    * frequency vectors is sum_k f_A(k) * f_B(k) — which is EXACTLY the
    * equi-join output size |A JOIN B ON key|, so this is sketch-based
    * join-size estimation: collisions only ADD cross terms, making the
    * estimate one-sided (>= truth) like the point query. Both sketches
    * must agree on geometry AND bucket rule; geometry is checked here,
    * the bucket rule is the caller's contract (same hash => same cells).
    */
  def inner(aBytes: Array[Byte], bBytes: Array[Byte]): Long = {
    val (depth, width) = geometryOf(aBytes)
    require(geometryOf(bBytes) == ((depth, width)),
      s"cms_inner sketch geometries differ: ${geometryOf(aBytes)} vs ${geometryOf(bBytes)}")
    val a = java.nio.ByteBuffer.wrap(aBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val b = java.nio.ByteBuffer.wrap(bBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      var sum = 0L
      var w = 0
      while (w < width) {
        val off = HeaderLen + (d * width + w) * 8
        sum += a.getLong(off) * b.getLong(off)
        w += 1
      }
      if (sum < min) min = sum
      d += 1
    }
    min
  }

  /** THE bucket rule, shared by every CMS call site (batch, streaming, and
    * the DuckDB oracles' relational twin): one md5 of the key, sliced into
    * d consecutive 8-hex-digit windows, each mod width. This is the
    * cross-engine contract — the oracles and the streaming==batch parity
    * spec recompute it bit-for-bit (`('0x' || substring(md5(k), 1+8*d, 8))
    * ::bigint % width` in DuckDB) — so there is exactly ONE Spark rendering
    * of it; a drifted copy would silently break sketch parity for just its
    * call site. All expressions are codegen builtins.
    */
  def bucketsCol(key: org.apache.spark.sql.Column, depth: Int, width: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(depth >= 1 && depth <= 4, s"bucketsCol slices one md5: depth in [1,4], got $depth")
    val h = md5(key)
    array((0 until depth).map { d =>
      (conv(substring(h, 1 + 8 * d, 8), 16, 10).cast("long") % width).cast("int")
    }: _*)
  }

  /** Registry builder: `cms_agg(buckets_array, depth, width)` (foldable
    * geometry; buckets_array is array<int> of length depth).
    */
  def aggBuild(exprs: Seq[Expression]): Expression = {
    Arity.require("cms_agg", "3 (cms_agg(buckets_array, depth, width))", exprs, 3, 3)
    require(exprs(1).foldable && exprs(2).foldable, "cms_agg geometry must be literals")
    CmsAgg(
      exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue()
    )
  }

  /** Registry builder: `cms_query(sketch_bytes, buckets_array)` — geometry
    * travels INSIDE the sketch bytes (see [[header]]).
    */
  def queryBuild(exprs: Seq[Expression]): Expression = {
    Arity.require("cms_query", "2 (cms_query(sketch_bytes, buckets_array))", exprs, 2, 2)
    CmsQuery(exprs.head, exprs(1))
  }

  /** Registry builder: `cms_inner(sketch_a, sketch_b)` — join-size /
    * inner-product estimate; geometries must match (checked at eval).
    */
  def innerBuild(exprs: Seq[Expression]): Expression = {
    Arity.require("cms_inner", "2 (cms_inner(sketch_a, sketch_b))", exprs, 2, 2)
    CmsInner(exprs.head, exprs(1))
  }

  /** Register the three functions for `expr(...)`/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cms_agg", aggBuild, "built-in")
    reg.createOrReplaceTempFunction("cms_query", queryBuild, "built-in")
    reg.createOrReplaceTempFunction("cms_inner", innerBuild, "built-in")
  }
}

/** The distributed counter build: one primitive d*w long buffer per partial,
  * element-wise-add merge, self-describing binary output (see
  * [[CountMinSketch]]). A null buckets ARRAY (e.g. a filtered-out row
  * under a CASE) is skipped, matching every other graft aggregate; a null
  * ELEMENT inside the array (a nullable bucket expression leaking through)
  * fails loudly — ArrayData.getInt would silently read it as bucket 0 and
  * corrupt the sketch.
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != ArrayType(IntegerType) && child.dataType != ArrayType(IntegerType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(s"cms_agg expects array<int> buckets, got ${child.dataType.sql}")
    else if (depth < 1 || width < 1 || depth.toLong * width > CountMinSketch.MaxCells)
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg geometry out of range: depth=$depth width=$width (max cells ${CountMinSketch.MaxCells})")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"cms_agg row has ${arr.numElements()} bucket indices, depth is $depth")
      var d = 0
      while (d < depth) {
        require(!arr.isNullAt(d), s"cms_agg bucket $d is null (nullable bucket expression?)")
        val b = arr.getInt(d)
        require(b >= 0 && b < width, s"cms_agg bucket $b outside [0,$width)")
        buf(d * width + b) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CountMinSketch.toBytes(buf, depth, width)

  override def serialize(buf: Array[Long]): Array[Byte]     = CountMinSketch.toRawBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CountMinSketch.fromRawBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false
  override def prettyName: String = "cms_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}

/** `cms_query(sketch_bytes, buckets_array)` with whole-stage codegen: the
  * generated code calls the same static [[CountMinSketch.query]] the
  * interpreted path uses. The sketch bytes are typically a broadcast
  * 1-row crossJoin column or a literal, so codegen hoists them; the probe
  * is d array reads + d counter reads per row.
  */
case class CmsQuery(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"cms_query expects binary sketch, got ${left.dataType.sql}")
    else if (right.dataType != ArrayType(IntegerType) && right.dataType != ArrayType(IntegerType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(s"cms_query expects array<int> buckets, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(sketch: Any, buckets: Any): Any =
    CountMinSketch.query(sketch.asInstanceOf[Array[Byte]], buckets.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (sketch, buckets) =>
        s"${ev.value} = graft.functions.CountMinSketch.query($sketch, $buckets);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cms_inner(sketch_a, sketch_b)` with whole-stage codegen — the
  * join-size estimator (see [[CountMinSketch.inner]]). Typically both
  * inputs are 1-row aggregate results crossJoined together, so this runs
  * once per pair, not per data row.
  */
case class CmsInner(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_inner"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_inner expects two binary sketches, got ${left.dataType.sql}, ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    CountMinSketch.inner(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"${ev.value} = graft.functions.CountMinSketch.inner($a, $b);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
