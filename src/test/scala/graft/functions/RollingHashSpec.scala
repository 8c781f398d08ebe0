package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaSpark(s: String): Long = {
    RollingHash.register(spark)
    Seq(Tuple1(s)).toDF("t").select(expr("rolling_hash(t)")).collect()(0).getLong(0)
  }

  /** Independent reference: BigInt polynomial mod M. */
  private def reference(s: String): Long = {
    val M = BigInt((1L << 61) - 1)
    val B = BigInt(131)
    s.getBytes("UTF-8").zipWithIndex
      .map { case (b, i) => (BigInt((b & 0xff) + 1) * B.modPow(i, M)) % M }
      .foldLeft(BigInt(0))((a, x) => (a + x) % M)
      .toLong
  }

  test("matches independent BigInt reference on varied inputs") {
    val rnd = new scala.util.Random(11)
    val cases = Seq("", "a", "hello world", "ünïcødé ツ", "x" * 1000) ++
      (1 to 20).map(_ => rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
    cases.foreach { s =>
      assert(viaSpark(s) === reference(s), s"mismatch for '${s.take(30)}'")
    }
  }

  test("order-sensitive (not a bag hash) and prefix-sensitive") {
    assert(viaSpark("ab") !== viaSpark("ba"))
    assert(viaSpark("abc") !== viaSpark("abcd"))
  }

  test("eval path agrees with codegen path") {
    val e = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("agreement test"))
    assert(e.eval(null) === viaSpark("agreement test"))
  }

  test("distinct fingerprints on the fixture corpus (no spurious collisions)") {
    RollingHash.register(spark)
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val n    = docs.count()
    val nfp = docs.select(expr("rolling_hash(text)").as("fp")).distinct().count()
    assert(nfp === n)
  }

  test("hashOf handles multi-byte UTF-8 deterministically") {
    val u = UTF8String.fromString("héllo wörld")
    val e = RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("x"))
    assert(e.hashOf(u) === e.hashOf(UTF8String.fromString("héllo wörld")))
  }
}
