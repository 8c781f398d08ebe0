package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential + planted checks for the Unigram-LM tokenizer family:
  * the distributed hard-EM trainer must reproduce an in-memory reference
  * of the SAME fixed-point scoring, Viterbi cascade, and prune rule
  * round for round on the fixture corpus, and the planted cases pin what
  * makes a unigram LM NOT BPE/WordPiece — it SHRINKS a seed vocabulary
  * (pieces the Viterbi model stops choosing are pruned) and its encode
  * is a global argmax (a Viterbi path can reject the locally-longest
  * piece a greedy walk would take).
  */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val Unk        = Unigram.UnkUnits

  // ── in-memory reference (independent third derivation) ────────────────

  private def refScores(vocab: Map[String, Long]): Map[String, Long] = {
    val t = vocab.values.sum.toDouble
    vocab.map { case (g, c) => g -> math.floor(1e6 * math.log(c.toDouble / t)).toLong }
  }

  private def refViterbi(text: String, sc: Map[String, Long]): String = {
    val t = text.split(" ", -1)
    val n = t.length
    val b = Array.fill(n + 1)(0L)
    def cand(p: Int, l: Int): Option[Long] =
      if (l == 1) Some(b(p - 1) + sc.getOrElse(t(p - 1), Unk))
      else if (p >= l) sc.get(t.slice(p - l, p).mkString("_")).map(b(p - l) + _)
      else None
    for (p <- 1 to n) {
      val c1 = cand(p, 1).get
      val c2 = cand(p, 2)
      val c3 = cand(p, 3)
      b(p) =
        if (c3.exists(v => v >= c2.getOrElse(v) && v >= c1)) c3.get
        else if (c2.exists(_ >= c1)) c2.get
        else c1
    }
    val pieces = List.newBuilder[String]
    var p      = n
    val rev    = scala.collection.mutable.ListBuffer.empty[String]
    while (p > 0) {
      val l =
        if (cand(p, 3).contains(b(p))) 3
        else if (cand(p, 2).contains(b(p))) 2
        else 1
      rev.prepend(t.slice(p - l, p).mkString("_"))
      p -= l
    }
    pieces ++= rev
    pieces.result().mkString(" ")
  }

  /** (final vocab g->(n, c), final scores g->li) by the same hard-EM. */
  private def refTrain(texts: Seq[String], rounds: Int): (Map[String, (Int, Long)], Map[String, Long]) = {
    val seqs = texts.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cnt  = scala.collection.mutable.Map.empty[String, Long]
    val nlen = scala.collection.mutable.Map.empty[String, Int]
    for {
      (s, w) <- seqs
      t = s.split(" ", -1)
      n <- 1 to 3
      i <- 0 to t.length - n
    } {
      val g = t.slice(i, i + n).mkString("_")
      cnt(g) = cnt.getOrElse(g, 0L) + w
      nlen(g) = n
    }
    var vocab: Map[String, Long] =
      cnt.filter { case (g, c) => nlen(g) == 1 || c >= 3 }.toMap
    for (_ <- 1 to rounds) {
      val sc   = refScores(vocab)
      val used = scala.collection.mutable.Map.empty[String, Long]
      for ((s, w) <- seqs; g <- refViterbi(s, sc).split(" ", -1))
        used(g) = used.getOrElse(g, 0L) + w
      vocab = vocab.flatMap { case (g, _) =>
        val u = used.getOrElse(g, 0L)
        if (nlen(g) == 1) Some(g -> math.max(u, 1L))
        else if (u > 0) Some(g -> u)
        else None
      }
    }
    (vocab.map { case (g, c) => g -> ((nlen(g), c)) }, refScores(vocab))
  }

  // ── differential on the fixture corpus ─────────────────────────────────

  test("full trained vocab (counts AND fixed-point scores) matches the in-memory reference") {
    val texts = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("text")
      .collect()
      .map(_.getString(0))
      .toSeq
    val (refVocab, refSc) = refTrain(texts, Unigram.Rounds)
    val got = Unigram
      .trainedUnigram(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === refVocab.keySet, "vocab membership diverged")
    got.foreach { case (g, (n, c, li)) =>
      assert((n, c) === refVocab(g), s"count diverged on piece $g")
      assert(li === refSc(g), s"fixed-point score diverged on piece $g")
    }
  }

  test("Viterbi encode matches the in-memory reference on every fixture text") {
    val docs  = graft.Tables.documents(spark, TestSpark.sfDir)
    val vocab = Unigram.trainedUnigram(spark, TestSpark.sfDir)
    val sc = vocab.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val got = Unigram
      .encodeViterbi(docs, vocab)
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    val texts = docs.select("text").collect().map(_.getString(0)).toSet
    assert(got.keySet === texts)
    texts.foreach(t => assert(got(t) === refViterbi(t, sc), s"Viterbi walk diverged on: $t"))
    // '_' never occurs in the corpus alphabet, so the encoding is lossless
    got.foreach { case (orig, e) => assert(e.replace('_', ' ') === orig) }
  }

  test("removal-loss ranking matches the in-memory exact-integer derivation") {
    val texts = graft.Tables
      .documents(spark, TestSpark.sfDir)
      .select("text")
      .collect()
      .map(_.getString(0))
      .toSeq
    val (refVocab, refSc) = refTrain(texts, Unigram.Rounds)
    val pieces = refVocab.collect { case (g, (n, c)) if n >= 2 => (g, n, c) }.toSeq
    val n2 = pieces.size.toLong
    val expected = pieces
      .map { case (g, n, c) =>
        val alt  = g.split("_", -1).map(refSc).sum
        val loss = c * (refSc(g) - alt)
        (g, n.toLong, c, refSc(g), alt, loss)
      }
      .sortBy { case (g, _, _, _, _, loss) => (-loss, g) }
      .zipWithIndex
      .map { case ((g, n, c, li, alt, loss), i) =>
        val rk = i + 1L
        (g, n, c, li, alt, loss, rk, if (rk * 5 <= n2 * 4) 1L else 0L)
      }
      .take(500)
    val got = graft.SparkEntry
      .queries("q_unigram_vocab_loss")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(got === expected, "removal-loss ranking diverged from the in-memory reference")
  }

  // ── planted cases ──────────────────────────────────────────────────────

  test("the vocabulary SHRINKS: pieces the Viterbi model stops using are pruned") {
    import spark.implicits._
    // 'm n o' x3 seeds m_n / n_o / m_n_o (each count 3). Viterbi segments
    // the whole doc as the single trigram piece (one log-penalty beats
    // two), so the two bigrams get ZERO use counts and must be pruned;
    // the trigram and the unigrams must survive.
    val docs  = (1 to 3).map(i => (i.toLong, "m n o")).toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(docs, Unigram.Rounds).collect().map(_.getString(0)).toSet
    assert(vocab.contains("m_n_o"), s"dominant trigram must survive: $vocab")
    assert(!vocab.contains("m_n") && !vocab.contains("n_o"),
      s"unused bigrams must be pruned (the shrink direction): $vocab")
    assert(Set("m", "n", "o").subsetOf(vocab), s"unigrams are never pruned: $vocab")
  }

  test("Viterbi encode is a GLOBAL argmax: it rejects the locally-longest piece greedy would take") {
    import spark.implicits._
    // counts: a=10, c(a_b)=3, b_c=22, c=22 — at 'a b c' the greedy
    // longest-match walk grabs a_b first ('a_b c'); the Viterbi path
    // compares whole segmentations and takes 'a b_c' because
    // ln(10)+ln(22) > ln(3)+ln(22) (a_b is a WEAK piece: most a's are not
    // followed by b). The trigram a_b_c is seen only twice — below the
    // seed threshold — so no single piece can cover the doc.
    val docs = (
      Seq.fill(2)("a b c") ++ Seq.fill(1)("a b") ++
        Seq.fill(20)("b c") ++ Seq.fill(7)("a x")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(docs, Unigram.Rounds)
    val enc = Unigram
      .encodeViterbi(docs, vocab)
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    assert(enc("a b c") === "a b_c",
      s"Viterbi must pick the globally-best path over greedy's a_b grab: $enc")
  }

  test("held-out unknown tokens take the UNK floor and pass through as themselves") {
    import spark.implicits._
    val train = (1 to 5).map(i => (i.toLong, "a b")).toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(train, Unigram.Rounds)
    val held  = Seq((100L, "a z b"), (101L, "z z")).toDF("doc_id", "text")
    val enc = Unigram
      .encodeViterbi(held, vocab)
      .collect()
      .map(r => (r.getString(0).trim, r.getString(1)))
      .toMap
    assert(enc("a z b") === "a z b", s"unknown token must pass through: $enc")
    assert(enc("z z") === "z z", s"an all-unknown doc must still segment: $enc")
  }

  test("training is frozen-vocab on apply: held-out statistics never add a piece") {
    import spark.implicits._
    val train = (1 to 5).map(i => (i.toLong, "a b")).toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(train, Unigram.Rounds)
    // held-out doc dominated by 'q r' — a re-learning encoder would emit
    // q_r; the frozen vocab segments it as unknown unigrams
    val held = Seq((100L, "q r q r q r a b")).toDF("doc_id", "text")
    val enc  = Unigram.encodeViterbi(held, vocab).collect()
    assert(enc.length === 1)
    assert(enc.head.getString(1) === "q r q r q r a_b",
      s"only trained pieces may appear in the encode: ${enc.head}")
  }
}
