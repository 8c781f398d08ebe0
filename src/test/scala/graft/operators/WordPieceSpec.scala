package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Differential checks for the WordPiece family: the distributed trainer
  * must reproduce an in-memory reference of the SAME likelihood-ratio
  * argmax + iterated-replace semantics round for round, and the greedy
  * encoder must reproduce an in-memory longest-match-first walk doc for
  * doc. Plus the two planted cases that pin what makes WordPiece NOT BPE:
  * a corpus where the likelihood argmax and the count argmax pick
  * different merges, and a vocab where longest-match-first beats a
  * merge-order replay.
  */
class WordPieceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** In-memory reference trainer: same likelihood score, same (score desc,
    * a, b) tiebreak, same 4-pass non-overlapping rewrite.
    */
  private def referenceTrain(
      docs0: Seq[String],
      rounds: Int
  ): Seq[(Long, String, String, Long, Long, Long, Double)] = {
    var docs = docs0.map(s => s" $s ")
    val out  = Seq.newBuilder[(Long, String, String, Long, Long, Long, Double)]
    for (k <- 1 to rounds) {
      val uni   = scala.collection.mutable.Map.empty[String, Long]
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { s =>
        val t = s.trim.split(" ", -1)
        t.foreach(tok => uni(tok) = uni.getOrElse(tok, 0L) + 1)
        if (t.length >= 2)
          (0 until t.length - 1).foreach(i =>
            pairs((t(i), t(i + 1))) = pairs.getOrElse((t(i), t(i + 1)), 0L) + 1)
      }
      val scored = pairs.toSeq.map { case ((a, b), n) =>
        (a, b, n, uni(a), uni(b), n.toDouble / (uni(a).toDouble * uni(b).toDouble))
      }
      val (a, b, n, na, nb, sc) = scored.minBy { case (a, b, _, _, _, sc) => (-sc, a, b) }
      out += ((k.toLong, a, b, n, na, nb, sc))
      docs = docs.map { s =>
        var x = s
        for (_ <- 1 to 4) x = x.replace(s" $a $b ", s" ${a}_$b ")
        x
      }
    }
    out.result()
  }

  /** In-memory reference greedy encoder: longest vocab match at each
    * position, singles always match.
    */
  private def referenceEncode(text: String, vocab: Set[String]): String = {
    val t   = text.split(" ", -1)
    val out = Seq.newBuilder[String]
    var i   = 0
    while (i < t.length) {
      var l = 1
      for (ll <- (t.length - i) to 2 by -1)
        if (l == 1 && vocab.contains(t.slice(i, i + ll).mkString("_"))) l = ll
      out += t.slice(i, i + l).mkString("_")
      i += l
    }
    out.result().mkString(" ")
  }

  test("6 learned merges match the in-memory likelihood-ratio reference, rounds in order") {
    val docs = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("text")
      .collect()
      .map(_.getString(0))
      .toSeq
    val expected = referenceTrain(docs, 6)
    val got = SparkEntry
      .queries("q_wordpiece_merges")(spark, TestSpark.sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))
      .toSeq
    assert(got === expected, "distributed WordPiece merges must match the reference trainer")
  }

  test("likelihood argmax diverges from the count argmax where it should (the WordPiece-vs-BPE case)") {
    import spark.implicits._
    // (a,b) occurs 4 times but a and b are common (na=nb=4): score 0.25.
    // (q,r) occurs 3 times among rare symbols (nq=nr=3): score 1/3. A
    // count argmax (BPE) picks (a,b); the likelihood argmax must pick
    // (q,r) — the reliable collocation over the merely-common pair.
    val docs = (Seq.fill(3)("q r") :+ "a b a b a b a b").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val bpe = Bpe.trainMerges(docs, rounds = 1).collect().head
    assert((bpe.getString(1), bpe.getString(2)) === (("a", "b")), s"BPE count argmax: $bpe")
    val wp = WordPiece.trainWordPiece(docs, rounds = 1).collect().head
    assert((wp.getString(1), wp.getString(2)) === (("q", "r")), s"WordPiece likelihood argmax: $wp")
    assert(wp.getLong(3) === 3L && wp.getLong(4) === 3L && wp.getLong(5) === 3L)
    assert(wp.getDouble(6) === 3.0 / 9.0)
  }

  test("rounds run on the distinct-sequence frequency table, not the corpus") {
    import spark.implicits._
    val texts      = Seq("a b a b c", "a b x y", "z z z")
    val docs       = (1 to 30).map(i => (i.toLong, texts(i % 3))).toDF("doc_id", "text")
    val roundSizes = scala.collection.mutable.Map.empty[Int, Long]
    WordPiece
      .trainWordPiece(docs, rounds = 2, onRoundFrame = (k, f) => roundSizes(k) = f.count())
      .collect()
    assert(roundSizes(1) === 3L, s"round-1 input must be the 3 distinct texts: $roundSizes")
    assert(roundSizes(2) <= 3L, s"round-2 input stays distinct-text-sized (30 docs): $roundSizes")
  }

  test("greedy encode matches the in-memory longest-match-first reference on the fixture corpus") {
    val docs   = graft.Tables.documents(spark, TestSpark.sfDir)
    val merges = WordPiece.trainedWordPiece(spark, TestSpark.sfDir)
    val vocab = merges
      .collect()
      .map(r => r.getString(1) + "_" + r.getString(2))
      .toSet
    val got = WordPiece
      .encodeGreedy(docs, merges)
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    val texts = docs.select("text").collect().map(_.getString(0)).toSet
    assert(got.keySet === texts)
    texts.foreach { t =>
      assert(got(t) === referenceEncode(t, vocab), s"greedy walk diverged on: $t")
    }
    // '_' never occurs in the corpus alphabet, so the encoding is lossless
    got.foreach { case (orig, e) => assert(e.replace('_', ' ') === orig) }
  }

  test("longest-match-first: a position matching both a 2-symbol and a 3-symbol vocab entry takes the longer") {
    import spark.implicits._
    // vocab {a_b (round 1), a_b_c (round 2)} — a merge-order replay and
    // the greedy walk agree on 'a b c' only because greedy prefers the
    // LONGEST match; an encoder taking the first/shortest match would
    // emit 'a_b c'
    val merges = Seq((1L, "a", "b"), (2L, "a_b", "c")).toDF("round", "a", "b")
    val docs   = Seq((1L, "a b c d"), (2L, "a b x c")).toDF("doc_id", "text")
    val enc = WordPiece
      .encodeGreedy(docs, merges)
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    assert(enc("a b c d") === "a_b_c d", enc.toString)
    assert(enc("a b x c") === "a_b x c", enc.toString)
  }

  test("apply is FROZEN-vocab: held-out statistics never pick a merge") {
    import spark.implicits._
    val train  = (1 to 5).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val merges = WordPiece.trainWordPiece(train, rounds = 1)
    // held-out doc dominated by 'q r' — a re-learning encoder would merge
    // q_r; the frozen vocab must only ever merge the trained symbol
    val held = Seq((100L, "q r q r q r a b")).toDF("doc_id", "text")
    // training ties (a,b)/(b,c) at score 5/25 — the (a, b) tiebreak wins,
    // same rule as the oracle's ORDER BY
    assert(merges.collect().map(r => (r.getString(1), r.getString(2))).toSeq === Seq(("a", "b")))
    val enc = WordPiece.encodeGreedy(held, merges).collect()
    assert(enc.length === 1)
    assert(enc.head.getString(1) === "q r q r q r a_b",
      s"the trained table, not the held-out corpus's statistics, must drive the encode: ${enc.head}")
  }
}
