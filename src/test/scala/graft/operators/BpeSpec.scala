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

  test("rounds run on the distinct-sequence frequency table, not the corpus (Sennrich formulation)") {
    import spark.implicits._
    // 30 docs but only 3 distinct texts — a corpus-shaped trainer would
    // carry 30 rows into every round; the frequency-table trainer must
    // carry exactly |distinct texts|, and the merge table must be the
    // SAME as training on the raw corpus (weights preserve the counts)
    val texts = Seq("a b a b c", "a b x y", "z z z")
    val docs = (1 to 30).map(i => (i.toLong, texts(i % 3))).toDF("doc_id", "text")
    val roundSizes = scala.collection.mutable.Map.empty[Int, Long]
    val merges = Bpe
      .trainMerges(docs, rounds = 3, onRoundFrame = (k, f) => roundSizes(k) = f.count())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(roundSizes(1) === 3L, s"round-1 input must be the 3 distinct texts: $roundSizes")
    assert(roundSizes(2) <= 3L && roundSizes(2) >= 1L,
      s"round-2 input stays distinct-text-sized (30 docs): $roundSizes")
    // weighted counts == raw-corpus counts: 'a b' occurs 2x in text0 (10
    // docs) + 1x in text1 (10 docs) = 30; 'z z' occurs 2x in text2 (10
    // docs) = 20. Round 1 merges (a,b) with n=30; after the rewrite the
    // best pair is (z,z) n=20 (vs a_b->a_b 10, a_b->c 10, a_b->x 10 —
    // lexicographic loses to count)
    assert(merges(0) === ((1L, "a", "b", 30L)), merges.mkString(","))
    assert(merges(1) === ((2L, "z", "z", 20L)), merges.mkString(","))
  }

  test("encode: applies every learned merge to each distinct text, '_'-joins decode back to the original") {
    import spark.implicits._
    val texts = Seq("a b a b c", "a b x y", "z z z")
    val docs  = (1 to 30).map(i => (i.toLong, texts(i % 3))).toDF("doc_id", "text")
    val enc = Bpe
      .encodeWithMerges(docs, Bpe.trainMerges(docs, rounds = 2))
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    // round 1 merges (a,b) n=30; round 2 merges (z,z) n=20 (see the
    // frequency-table test above) — the apply runs BOTH merges, including
    // the final round's
    assert(enc === Map(
      "a b a b c" -> "a_b a_b c",
      "a b x y"   -> "a_b x y",
      "z z z"     -> "z_z z"
    ), enc.toString)
    // '_' never occurs in the corpus alphabet, so the encoding is lossless
    enc.foreach { case (orig, e) => assert(e.replace('_', ' ') === orig) }
  }

  test("apply is FROZEN-vocab: a held-out doc whose own statistics would pick a different merge is encoded with the trained table") {
    import spark.implicits._
    // trained tokenizer: 'a b' dominates the training corpus (ties with
    // 'b c' broken lexicographically)
    val train  = (1 to 5).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(train, rounds = 1)
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq === Seq(("a", "b")))
    // held-out doc: 'q r' repeats 3x — an encoder that re-learns from the
    // encode corpus would merge q_r; the frozen vocab must merge ONLY a_b
    val held = Seq((100L, "q r q r q r a b")).toDF("doc_id", "text")
    val enc  = Bpe.encodeWithMerges(held, merges).collect()
    assert(enc.length === 1)
    assert(enc.head.getString(1) === "q r q r q r a_b",
      s"the trained table, not the held-out corpus's statistics, must drive the encode: ${enc.head}")
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
