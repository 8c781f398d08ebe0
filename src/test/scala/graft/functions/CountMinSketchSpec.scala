package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Pins the count-min invariants `q_cms_freq` rests on:
  *   - estimate >= true count for EVERY key (the one-sided CMS guarantee),
  *     with equality when a key's rows are collision-free,
  *   - merge == sketch of the concatenation EXACTLY (counters are sums —
  *     the lossless-mergeability property KMV/TopK only have up to
  *     truncation),
  *   - the self-describing header round-trips geometry and rejects
  *     foreign / truncated / mismatched bytes loudly,
  *   - distributed build == local build, and codegen and interpreted
  *     probes agree,
  *   - serialize/deserialize round-trips the partial buffer.
  */
class CountMinSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val Depth = 4
  private val Width = 32

  /** The same sliced-md5 bucket rule the query uses, driver-side: one
    * digest, 8-hex-digit windows as the d hash rows.
    */
  private def buckets(key: String): Array[Int] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (0 until Depth).map { d =>
      (java.lang.Long.parseLong(hex.substring(8 * d, 8 * d + 8), 16) % Width).toInt
    }.toArray
  }

  private def buildLocal(keys: Seq[String]): Array[Byte] = {
    val counters = new Array[Long](Depth * Width)
    keys.foreach { k =>
      val bks = buckets(k)
      (0 until Depth).foreach(d => counters(d * Width + bks(d)) += 1L)
    }
    CountMinSketch.toBytes(counters, Depth, Width)
  }

  private def estimate(sketch: Array[Byte], key: String): Long =
    CountMinSketch.query(sketch, new GenericArrayData(buckets(key)))

  test("estimate >= truth for every key; exact under no collisions") {
    val keys   = (0 until 400).flatMap(i => Seq.fill(i % 5 + 1)(s"key-$i"))
    val truth  = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = buildLocal(keys)
    truth.foreach { case (k, n) =>
      val est = estimate(sketch, k)
      assert(est >= n, s"CMS under-counted $k: $est < $n")
    }
    // a lone key in an otherwise-empty sketch is exact
    val single = buildLocal(Seq.fill(7)("only"))
    assert(estimate(single, "only") == 7L)
  }

  test("merge == sketch of the concatenation, counter-exact") {
    val a  = (0 until 300).map(i => s"a-${i % 37}")
    val b  = (0 until 300).map(i => s"b-${i % 53}")
    val agg = CmsAgg(org.apache.spark.sql.catalyst.expressions.Literal(null), Depth, Width)
    def counters(keys: Seq[String]): Array[Long] = {
      val buf = agg.createAggregationBuffer()
      keys.foreach { k =>
        val bks = buckets(k)
        (0 until Depth).foreach(d => buf(d * Width + bks(d)) += 1L)
      }
      buf
    }
    val merged = agg.merge(counters(a), counters(b))
    assert(merged.toSeq == counters(a ++ b).toSeq)
  }

  test("serialize/deserialize round-trips the partial buffer") {
    val agg = CmsAgg(org.apache.spark.sql.catalyst.expressions.Literal(null), Depth, Width)
    val buf = Array.tabulate(Depth * Width)(i => (i * 31L) % 97)
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
  }

  test("header: geometry round-trips; foreign / truncated / mismatched bytes rejected") {
    val bytes = buildLocal(Seq("x"))
    assert(CountMinSketch.geometryOf(bytes) == ((Depth, Width)))
    // foreign magic
    val foreign = bytes.clone(); foreign(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](CountMinSketch.geometryOf(foreign))
    // wrong version
    val wrongV = bytes.clone(); wrongV(3) = 9.toByte
    assertThrows[IllegalArgumentException](CountMinSketch.geometryOf(wrongV))
    // truncated body (header claims Depth x Width, bytes are short)
    assertThrows[IllegalArgumentException](CountMinSketch.geometryOf(bytes.take(bytes.length - 8)))
    // probe with wrong bucket-array length fails loudly
    assertThrows[IllegalArgumentException](
      CountMinSketch.query(bytes, new GenericArrayData(Array(1, 2))))
    // probe bucket outside width fails loudly
    assertThrows[IllegalArgumentException](
      CountMinSketch.query(bytes, new GenericArrayData(Array(0, 0, 0, Width))))
    // a NULL bucket element fails loudly (ArrayData.getInt would silently
    // read it as bucket 0 and probe/count the wrong cell)
    assertThrows[IllegalArgumentException](
      CountMinSketch.query(bytes, new GenericArrayData(Array[Any](0, null, 0, 0))))
  }

  test("aggregate rejects a null bucket ELEMENT; skips a null bucket ARRAY") {
    CountMinSketch.register(spark)
    import spark.implicits._
    // whole-array null (filtered-out row under a CASE): skipped like every
    // other graft aggregate — sketch equals the non-null rows' sketch
    val withNullRow = Seq(Some("a"), None, Some("b")).toDF("t")
      .select(when(col("t").isNotNull, CountMinSketch.bucketsCol(col("t"), Depth, Width)).as("bks"))
      .agg(expr(s"cms_agg(bks, $Depth, $Width)")).head().getAs[Array[Byte]](0)
    assert(withNullRow.toSeq == buildLocal(Seq("a", "b")).toSeq)
    // null ELEMENT inside the array: loud failure, not a silent bucket-0 count
    val ex = intercept[Exception] {
      Seq("a").toDF("t")
        .select(array(lit(null).cast("int"), lit(0), lit(0), lit(0)).as("bks"))
        .agg(expr(s"cms_agg(bks, $Depth, $Width)")).head()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.contains("null")),
      s"expected a loud null-bucket failure, got: ${ex.getMessage}")
  }

  test("inner product: >= true join size for every input, exact under no collisions, geometry checked") {
    // frequency vectors over a small key set: join size = sum f_a * f_b
    val a = (0 until 200).map(i => s"u-${i % 11}")
    val b = (0 until 300).map(i => s"u-${i % 7}")
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = fa.keys.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
    val est = CountMinSketch.inner(buildLocal(a), buildLocal(b))
    assert(est >= truth, s"CMS inner under-estimated: $est < $truth")

    // two singleton sketches of the same key: inner == 1 exactly
    assert(CountMinSketch.inner(buildLocal(Seq("k")), buildLocal(Seq("k"))) == 1L)
    // disjoint singletons: collisions aside, usually 0 — at minimum one-sided
    assert(CountMinSketch.inner(buildLocal(Seq("k1")), buildLocal(Seq("k2"))) >= 0L)

    // geometry mismatch fails loudly
    val other = CountMinSketch.toBytes(new Array[Long](2 * Width), 2, Width)
    assertThrows[IllegalArgumentException](CountMinSketch.inner(buildLocal(Seq("x")), other))
  }

  test("SQL aggregate + probe: distributed build equals local build, codegen and interpreted") {
    CountMinSketch.register(spark)
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"tok-${i % 211}")
    def bucketCol(t: org.apache.spark.sql.Column) = CountMinSketch.bucketsCol(t, Depth, Width)
    val built = keys.toDF("t").select(bucketCol(col("t")).as("bks"))
      .agg(expr(s"cms_agg(bks, $Depth, $Width)")).head().getAs[Array[Byte]](0)
    assert(built.toSeq == buildLocal(keys).toSeq, "distributed build != local build")

    val probes  = keys.distinct.take(50) ++ Seq("absent-1", "absent-2")
    val sketchDf = keys.toDF("t2").select(bucketCol(col("t2")).as("b2"))
      .agg(expr(s"cms_agg(b2, $Depth, $Width)").as("sk"))
    val probeDf = probes.toDF("t").withColumn("bks", bucketCol(col("t")))
      .crossJoin(broadcast(sketchDf))
    def run(codegen: String): Seq[(String, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try probeDf
        .select(col("t"), expr("cms_query(sk, bks)").as("est"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen    = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen == interp, "codegen and interpreted cms_query disagree")
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    gen.foreach { case (t, est) => assert(est >= truth.getOrElse(t, 0L), s"under-count for $t") }
  }
}
