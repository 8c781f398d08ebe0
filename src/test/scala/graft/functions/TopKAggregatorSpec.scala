package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("aggregate top-k equals the window-based top-k row for row") {
    val agg = graft.SparkEntry
      .queries("q_topk_agg")(spark, TestSpark.sfDir)
      .collect()
      .map(_.toSeq)
    val win = graft.SparkEntry
      .queries("q_topk_pergroup")(spark, TestSpark.sfDir)
      .collect()
      .map(_.toSeq)
    assert(agg.toSeq === win.toSeq)
  }

  test("buffer keeps at most k, merge preserves global order with tiebreaks") {
    val t = new TopK(2)
    val b1 = Seq(Scored(5.0, 10), Scored(3.0, 11)).foldLeft(t.zero)(t.reduce)
    val b2 = Seq(Scored(5.0, 9), Scored(4.0, 12)).foldLeft(t.zero)(t.reduce)
    val merged = t.finish(t.merge(b1, b2))
    // 5.0 ties broken by key asc: (5.0, 9) then (5.0, 10)
    assert(merged === Seq(Scored(5.0, 9), Scored(5.0, 10)))
  }

  test("reduce short-circuits when the candidate cannot enter the buffer") {
    val t = new TopK(1)
    val b = t.reduce(t.reduce(t.zero, Scored(9.0, 1)), Scored(1.0, 2))
    assert(t.finish(b) === Seq(Scored(9.0, 1)))
  }
}
