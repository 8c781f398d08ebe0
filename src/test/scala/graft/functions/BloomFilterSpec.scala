package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bloom build/probe invariants the decontamination prefilter
  * rests on (round-9 ADVICE):
  *   - NO false negatives across the word-array build path and the
  *     serialized byte-array probe path (the bit-layout consistency the
  *     two encodings must share),
  *   - merge == union of inserts (the partial-aggregation contract),
  *   - the serialized header round-trips numHashes and rejects foreign /
  *     truncated / wrong-version bytes loudly,
  *   - codegen and interpreted probes agree (same static method, but the
  *     wrapping differs — pinned, not assumed),
  *   - suggest() always returns sizes BloomAgg accepts, incl. the
  *     near-Int.MaxValue overflow edge and the k>16 fpp edge.
  */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def buildLocal(keys: Seq[String], numBits: Int, k: Int): Array[Byte] = {
    val words = new Array[Long](numBits / 64)
    keys.foreach(s => BloomFilter.add(words, numBits, k, UTF8String.fromString(s)))
    BloomFilter.toBytes(words, k)
  }

  test("no false negatives: every inserted key probes true, for every k") {
    val keys = (0 until 2000).map(i => s"key-$i-${i * 31}")
    for (k <- Seq(1, 4, 7, 16)) {
      val bytes = buildLocal(keys, 4096, k)
      assert(BloomFilter.numHashesOf(bytes) == k)
      val misses = keys.filterNot(s => BloomFilter.mightContain(bytes, UTF8String.fromString(s)))
      assert(misses.isEmpty, s"false negatives at k=$k: ${misses.take(3)}")
    }
  }

  test("fpp is bounded: a well-sized filter rejects most absent keys") {
    val (numBits, k) = BloomFilter.suggest(2000, 0.01)
    val bytes        = buildLocal((0 until 2000).map("in-" + _), numBits, k)
    val probes       = (0 until 10000).map("out-" + _)
    val fp           = probes.count(s => BloomFilter.mightContain(bytes, UTF8String.fromString(s)))
    assert(fp < 300, s"fpp ${fp / 10000.0} far above the 0.01 target") // 3% headroom on a 1% design
  }

  test("merge equals union of inserts") {
    val (a, b)  = ((0 until 500).map("a-" + _), (0 until 500).map("b-" + _))
    val k       = 5
    val numBits = 8192
    val wa      = new Array[Long](numBits / 64)
    val wb      = new Array[Long](numBits / 64)
    a.foreach(s => BloomFilter.add(wa, numBits, k, UTF8String.fromString(s)))
    b.foreach(s => BloomFilter.add(wb, numBits, k, UTF8String.fromString(s)))
    val merged = wa.zip(wb).map { case (x, y) => x | y }
    val direct = new Array[Long](numBits / 64)
    (a ++ b).foreach(s => BloomFilter.add(direct, numBits, k, UTF8String.fromString(s)))
    assert(merged.toSeq == direct.toSeq)
  }

  test("raw-word serde round-trips (the partial-buffer shuffle encoding)") {
    val words = Array(0L, -1L, 0x123456789abcdefL, Long.MinValue, 42L)
    assert(BloomFilter.fromRawBytes(BloomFilter.toRawBytes(words)).toSeq == words.toSeq)
  }

  test("header rejects foreign, truncated, and wrong-version bytes") {
    val good = buildLocal(Seq("x"), 64, 3)
    assert(BloomFilter.numHashesOf(good) == 3)
    intercept[IllegalArgumentException](BloomFilter.numHashesOf(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](BloomFilter.numHashesOf(new Array[Byte](16))) // zero magic
    val badVersion = good.clone(); badVersion(3) = 9
    intercept[IllegalArgumentException](BloomFilter.numHashesOf(badVersion))
    val badK = good.clone(); badK(4) = 99
    intercept[IllegalArgumentException](BloomFilter.numHashesOf(badK))
  }

  test("suggest always returns BloomAgg-acceptable sizes") {
    for ((keys, fpp) <- Seq((1L, 0.5), (1000L, 0.01), (224000000L, 0.01), (Long.MaxValue / 4, 1e-9), (100L, 1e-9))) {
      val (bits, k) = BloomFilter.suggest(keys, fpp)
      assert(bits >= 64 && bits % 64 == 0, s"bad bits $bits for ($keys, $fpp)")
      assert(k >= 1 && k <= BloomFilter.MaxHashes, s"bad k $k for ($keys, $fpp)")
    }
    // the overflow edge specifically: optimal bits exceed Int.MaxValue
    val (bits, _) = BloomFilter.suggest(300000000L, 0.01)
    assert(bits > 0 && bits <= Int.MaxValue && bits % 64 == 0)
    assert(bits == (Int.MaxValue.toLong / 64) * 64, "cap should be the largest 64-multiple fitting Int")
  }

  test("serialized filters OR-combine byte-wise into the union filter (multi-benchmark merge)") {
    // the advertised downstream-union property: two eval sets' filters,
    // built with the same sizing, OR into exactly the jointly-built filter
    // — identical headers OR to themselves, bit words OR to the union
    val (a, b)  = ((0 until 400).map("bench1-" + _), (0 until 400).map("bench2-" + _))
    val (bits, k) = (8192, 5)
    val fa    = buildLocal(a, bits, k)
    val fb    = buildLocal(b, bits, k)
    val union = fa.zip(fb).map { case (x, y) => (x | y).toByte }
    assert(union.toSeq == buildLocal(a ++ b, bits, k).toSeq)
    assert(BloomFilter.numHashesOf(union) == k)
    assert((a ++ b).forall(s => BloomFilter.mightContain(union, UTF8String.fromString(s))))
  }

  test("SQL aggregate + probe: distributed build equals local build, codegen and interpreted") {
    BloomFilter.register(spark)
    import spark.implicits._
    val keys  = (0 until 3000).map(i => s"gram-$i")
    val built = keys.toDF("g").agg(expr("bloom_agg(g, 16384, 5)")).head().getAs[Array[Byte]](0)
    assert(built.toSeq == buildLocal(keys, 16384, 5).toSeq, "distributed build != local build")

    val probes  = keys.take(100) ++ (0 until 100).map("absent-" + _)
    val probeDf = probes.toDF("g").crossJoin(broadcast(keys.toDF("g2").agg(expr("bloom_agg(g2, 16384, 5)").as("bf"))))
    def run(codegen: String): Seq[(String, Boolean)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try probeDf
        .select(col("g"), expr("bloom_might_contain(bf, g)").as("hit"))
        .collect()
        .map(r => (r.getString(0), r.getBoolean(1)))
        .toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = run("CODEGEN_ONLY")
    val int = run("NO_CODEGEN")
    assert(gen == int, "codegen and interpreted probes disagree")
    assert(gen.filter(_._1.startsWith("gram-")).forall(_._2), "false negative via SQL probe")
  }
}
