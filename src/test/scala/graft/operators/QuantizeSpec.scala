package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 quantization pins: the oracle proves Spark/DuckDB agree on the
  * arithmetic; these pin the arithmetic against the MATH — the per-
  * component dequantization bound and the quantized-cosine error bound —
  * on deterministic synthetic vectors (LCG, seed fixed) whose exact
  * cosines are computed driver-side.
  */
class QuantizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic vectors in [-1, 1], dim 64, varied magnitudes
  private val dim = 64
  private val vecs: Seq[(Long, Array[Float])] = {
    var state = 99L
    def next(): Float = {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((((state >>> 33).toDouble / (1L << 31).toDouble) - 0.5) * 2.0).toFloat
    }
    (0L until 40L).map { id =>
      val mag = 0.01f + (id % 7) * 0.3f // exercise small and large scales
      id -> Array.fill(dim)(next() * mag)
    }
  }

  private def frame = vecs.toDF("vec_id", "embedding").withColumn("label", lit(0))

  private def exactCos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i).toDouble)
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("dequantization error is within half a quantization step per component") {
    val rows = Quantize
      .quantizeEmbeddings(frame)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getSeq[Byte](3)))
    assert(rows.length === vecs.length)
    val byId = vecs.toMap
    rows.foreach { case (id, scale, codes) =>
      val x = byId(id)
      assert(codes.length === dim)
      codes.zipWithIndex.foreach { case (c, i) =>
        assert(math.abs(c) <= 127, s"code out of int8 range: $c")
        val dequant = c * scale / 127.0
        assert(
          math.abs(dequant - x(i)) <= scale / 254.0 + 1e-12,
          s"vec $id component $i: |${dequant} - ${x(i)}| > scale/254 (${scale / 254.0})"
        )
      }
    }
  }

  test("quantized cosine tracks exact cosine within 0.05 across all pairs") {
    val q = Quantize.quantizedFrame(frame).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](3).toArray).toMap
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      def dot(x: Array[Long], y: Array[Long]) =
        x.indices.foldLeft(0L)((acc, i) => acc + x(i) * y(i))
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    }
    val byId = vecs.toMap
    var worst = 0.0
    for (i <- vecs.indices; j <- 0 until i) {
      val e = exactCos(byId(i.toLong), byId(j.toLong))
      val g = qcos(q(i.toLong), q(j.toLong))
      worst = math.max(worst, math.abs(e - g))
    }
    assert(worst <= 0.05, s"worst |cos_q - cos| = $worst")
  }

  test("quantizedTopK ranks a planted near-duplicate first and itself-similarity at ~1") {
    // vec 100 = vec 0 scaled by 0.5 (cosine 1 exactly; quantized cosine ~1)
    val planted = vecs :+ (100L -> vecs.head._2.map(v => v * 0.5f))
    val f = planted.toDF("vec_id", "embedding").withColumn("label", lit(0))
    val top = Quantize.quantizedTopK(f, queryVecId = 0, k = 3).collect()
    assert(top.head.getLong(0) === 100L, "planted scaled copy must rank first")
    assert(top.head.getDouble(2) > 0.999, s"quantized cosine of a scaled copy ~ 1, got ${top.head.getDouble(2)}")
  }

  test("IVF-SQ8 probe: quantized scores track exact cosine on the fixture; ranking stays near the exact probe's") {
    val sq8 = graft.SparkEntry.queries("q_sim_ivf_sq8_probe")(spark, TestSpark.sfDir).collect()
    assert(sq8.length === 5)
    // per-row error bound against driver-computed exact cosine
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    sq8.foreach { r =>
      val e = exactCos(emb(r.getLong(0)), emb(0L))
      assert(math.abs(r.getDouble(1) - e) <= 0.05,
        s"vec ${r.getLong(0)}: cos_q ${r.getDouble(1)} vs exact $e")
    }
    // same candidate pool (the query's cluster), so the quantized top-5
    // must intersect the exact probe's top-5 — quantization may reorder
    // near-ties but cannot wander off to another cluster
    val exact = graft.SparkEntry.queries("q_sim_ivf_probe")(spark, TestSpark.sfDir)
      .collect().map(_.getLong(0)).toSet
    val overlap = (sq8.map(_.getLong(0)).toSet & exact).size
    assert(overlap >= 2, s"sq8 top-5 vs exact top-5 overlap $overlap")
  }

  test("QuantizedCosine codegen expression is bit-identical to the HOF SQL formulation") {
    graft.functions.VectorFunctions.register(spark)
    var state = 7L
    def nextCode(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % 255 - 127
    }
    val pairs = (0 until 200).map { i =>
      val d = 1 + i % 96 // varied dims, including tiny
      (Array.fill(d)(nextCode()), Array.fill(d)(nextCode()))
    }
    val df = pairs.toDF("qa", "qb").select(
      expr("quantized_cosine(qa, qb)").as("fused"),
      expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v) / " +
          "(sqrt(aggregate(zip_with(qa, qa, (x, y) -> x * y), 0L, (acc, v) -> acc + v)) * " +
          "sqrt(aggregate(zip_with(qb, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)))"
      ).as("hof")
    )
    df.collect().foreach { r =>
      val (f, h) = (r.getDouble(0), r.getDouble(1))
      assert(f === h, s"fused $f != hof $h") // EXACT: same longs, same division
    }
  }

  test("zero-norm and empty inputs yield null (never NaN) in both eval and codegen paths") {
    graft.functions.VectorFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
    // interpreted path (nullSafeEval)
    val zq  = Literal.create(Array(0L, 0L, 0L), ArrayType(LongType))
    val oq  = Literal.create(Array(1L, 2L, 3L), ArrayType(LongType))
    val eq  = Literal.create(Array.empty[Long], ArrayType(LongType))
    val zf  = Literal.create(Array(0f, 0f), ArrayType(FloatType))
    val of  = Literal.create(Array(1f, 2f), ArrayType(FloatType))
    assert(graft.functions.QuantizedCosine(zq, oq).eval(null) == null)
    assert(graft.functions.QuantizedCosine(oq, zq).eval(null) == null)
    assert(graft.functions.QuantizedCosine(eq, eq).eval(null) == null)
    assert(graft.functions.CosineSimilarity(zf, of).eval(null) == null)
    assert(graft.functions.CosineSimilarity(of, of).eval(null) != null)
    // codegen path, and parity with the SQL spelling's non-ANSI 0/0 -> null:
    // a NaN here would sort ABOVE every real score under desc and top a
    // similarity top-k (the failure mode this pins away)
    val rows = Seq(
      (Array(0L, 0L), Array(5L, 5L)),
      (Array(3L, 4L), Array(3L, 4L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("qa", "qb")
      .select(expr("quantized_cosine(qa, qb)").as("c"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(2).isNullAt(0))
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("quantized frame on the fixture: codes bounded, scales positive, every vector covered") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir)
    val stats = Quantize
      .quantizedFrame(emb)
      .select(
        count(lit(1)).as("n"),
        min(expr("array_min(qcode)")).as("lo"),
        max(expr("array_max(qcode)")).as("hi"),
        min(col("scale")).as("smin")
      )
      .collect()(0)
    assert(stats.getLong(0) === emb.count())
    assert(stats.getLong(1) >= -127L && stats.getLong(2) <= 127L)
    assert(stats.getDouble(3) > 0.0)
  }
}
