package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The map-only `char_entropy` expression must reproduce the relational
  * explode-formulation BIT-FOR-BIT (it is the same arithmetic with the
  * per-char rows collapsed) — that identity is what lets `q_text_entropy`
  * drop the Generate without touching its DuckDB oracle.
  */
class CharEntropySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("expression equals the explode pipeline exactly on every fixture doc") {
    CharEntropy.register(spark)
    val docs = Tables.documents(spark, TestSpark.sfDir)

    val viaExpr = docs
      .select(col("doc_id"), expr("char_entropy(text)").as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    val viaExplode = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n"),
        sum((col("c") * log(col("c"))).cast("decimal(18,12)")).as("clc")
      )
      .select(col("doc_id"), (log(col("n")) - col("clc").cast("double") / col("n")).as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

    assert(viaExpr.keySet === viaExplode.keySet)
    val diffs = viaExpr.collect {
      case (id, h) if java.lang.Double.compare(h, viaExplode(id)) != 0 => (id, h, viaExplode(id))
    }
    assert(diffs.isEmpty, s"bit-for-bit identity required, got diffs: ${diffs.take(5)}")
  }

  test("edge cases: empty string, single char, surrogate pairs, nulls") {
    CharEntropy.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, ""),                 // split('') -> one empty token: H = 0
      (2L, "aaaa"),             // one symbol: H = 0
      (3L, "ab"),               // two equiprobable: H = ln 2
      (4L, "😀😀x"), // astral code points count once each
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), expr("char_entropy(text)").as("h"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got(1L) === 0.0)
    // not exactly 0: the c*ln(c) term is decimal(18,12)-rounded (HALF_UP)
    // before the division, same as the relational form — a ~1e-13 artifact
    assert(math.abs(got(2L).asInstanceOf[Double]) < 1e-9)
    assert(math.abs(got(3L).asInstanceOf[Double] - math.log(2)) < 1e-12)
    // 3 code points, counts {2,1}: H = ln(3) - 2*ln(2)/3 (decimal-cast term)
    assert(math.abs(got(4L).asInstanceOf[Double] - (math.log(3) - 2 * math.log(2) / 3)) < 1e-9)
    assert(got(5L) === null)
  }
}
