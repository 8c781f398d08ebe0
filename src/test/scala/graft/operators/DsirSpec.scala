package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** DSIR behavior pins: the importance weights must actually pull toward
  * the target distribution, not just compute.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("target language separates upward: en has the highest average log-weight") {
    val rows = SparkEntry
      .queries("q_dsir_weights")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(2)))
      .toMap
    assert(rows.keySet === Set("de", "en", "es", "fr", "zh"))
    val enAvg = rows("en")
    (rows - "en").foreach { case (lang, avg) =>
      assert(enAvg > avg, s"en avg log-weight $enAvg must exceed $lang's $avg")
    }
  }

  test("weights are centered: every language's average log-weight is near 0 (bounded LM ratio)") {
    // log-weights are per-token log-ratios of two smoothed LMs over the
    // SAME corpus — per-doc magnitudes stay small; a blown-up average
    // means the smoothing or the bucket hashing broke
    SparkEntry
      .queries("q_dsir_weights")(spark, TestSpark.sfDir)
      .collect()
      .foreach { r =>
        assert(math.abs(r.getDouble(2)) < 2.0, s"${r.getString(0)}: avg ${r.getDouble(2)}")
      }
  }

  test("Gumbel selection over-represents the target language") {
    val sel = SparkEntry
      .queries("q_dsir_select")(spark, TestSpark.sfDir)
      .collect()
    assert(sel.length === 20)
    val byLang = sel.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val enCount = byLang.getOrElse("en", 0)
    byLang.foreach { case (lang, n) =>
      assert(enCount >= n, s"en ($enCount) must be the modal selected language, $lang has $n")
    }
    // keys are strictly ordered (descending, doc_id tiebreak)
    val keys = sel.map(_.getDouble(3)).toSeq
    assert(keys.sliding(2).forall { case Seq(a, b) => a >= b })
  }
}
