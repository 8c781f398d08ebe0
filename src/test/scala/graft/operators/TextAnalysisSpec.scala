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

  private def langidOn(rows: Seq[(Long, String, String)]): Map[String, String] = {
    // reuse the query's scoring logic by running it over a temp corpus via
    // the same TextShared constants
    import TextShared._
    val toks = split(col("text"), " ")
    val df = rows.toDF("doc_id", "text", "lang")
    val scored = df.select(
      col("lang") +: col("text") +:
        stopwords.map { case (l, ws) => size(filter(toks, x => x.isin(ws: _*))).as(s"sc_$l") }: _*
    )
    val langs = stopwords.map(_._1)
    val best = langs.foldRight(lit("und")) { (l, acc) =>
      val isMax = langs.filter(_ != l).map(o => col(s"sc_$l") >= col(s"sc_$o")).reduce(_ && _)
      when(col(s"sc_$l") > 0 && isMax, lit(l)).otherwise(acc)
    }
    scored.withColumn("p", best).collect().map(r => r.getAs[String]("text") -> r.getAs[String]("p")).toMap
  }

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

  private def SparkEntry_quality(rows: Seq[(Long, String)]): Map[Long, Double] = {
    import TextShared._
    val toks  = split(col("text"), " ")
    val nTok  = size(toks).cast("long")
    val nChar = length(col("text")).cast("long")
    val avgTokLen = length(regexp_replace(col("text"), " ", "")).cast("long") / nTok
    val punct     = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).cast("long") / nChar
    val stopR     = size(filter(toks, x => x.isin(stopwords.head._2: _*))).cast("long") / nTok
    val score = least(avgTokLen / 8.0, lit(1.0)) * 0.5 + stopR * 0.3 + (lit(1.0) - punct) * 0.2
    rows
      .toDF("doc_id", "text")
      .select(col("doc_id"), score.as("q"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
  }

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
