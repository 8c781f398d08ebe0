package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functional behavior of the text operators on constructed inputs (the
  * oracle checks parity on fixtures; this checks the operators do the right
  * thing on inputs with known answers).
  */
class TextAnalysisSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def langidOn(rows: Seq[(Long, String, String)]): Map[String, String] =
    TextAnalysis
      .langidFrame(rows.toDF("doc_id", "text", "lang"))
      .collect()
      .map(r => r.getAs[String]("text") -> r.getAs[String]("predicted"))
      .toMap

  test("language ID predicts by stopword evidence, 'und' without evidence") {
    val en = "the cat sat on the mat and the dog is in a box"
    val es = "el perro y la casa de los vecinos en que vivimos"
    val de = "der hund und die katze das ist mit uns"
    val xx = "zzz qqq www rrr ttt"
    val out = langidOn(Seq((1L, en, "en"), (2L, es, "es"), (3L, de, "de"), (4L, xx, "xx")))
    assert(out(en) === "en")
    assert(out(es) === "es")
    assert(out(de) === "de")
    assert(out(xx) === "und")
  }

  test("quality score is bounded and orders clean text above junk") {
    val q = SparkEntry_quality(
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog in a field of green grass"),
        (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
      )
    )
    assert(q(1L) > q(2L), s"clean text must outscore junk: $q")
    q.values.foreach(v => assert(v >= 0.0 && v <= 1.0, s"score out of [0,1]: $q"))
  }

  private def SparkEntry_quality(rows: Seq[(Long, String)]): Map[Long, Double] =
    TextAnalysis
      .qualityFrame(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("quality"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap

  test("fingerprint is whitespace/case-normalized") {
    val a = "Hello   World  FOO"
    val b = "hello world foo"
    val out = Seq((1L, a), (2L, b))
      .toDF("doc_id", "text")
      .select(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .collect()
      .map(_.getString(0))
    assert(out(0) === out(1))
  }

  test("repetition frame counts the dominant token in one map-side pass") {
    val rows = TextAnalysis
      .repetitionFrame(Seq((1L, "spam spam spam eggs"), (2L, "all tokens differ here")).toDF("doc_id", "text"))
      .select(col("doc_id"), col("top_c"), col("n_tok"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L) === ((3L, 4L)))
    assert(rows(2L) === ((1L, 4L)))
  }

  test("BPE-ish tokenization splits letters, digits, punctuation") {
    val n = Seq(Tuple1("ab12 cd! x9"))
      .toDF("text")
      .select(size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")).as("n"))
      .collect()(0)
      .getInt(0)
    // ab, 12, cd, !, x, 9
    assert(n === 6)
  }
}
