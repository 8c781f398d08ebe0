package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the distributed exact-substring and winnowing
  * operators vs straight-line in-memory reference implementations, over
  * seeded random corpora. The planted-case specs prove specific behaviors;
  * these prove the general contract on inputs nobody hand-picked —
  * overlapping duplicates, runs at doc edges, repeated grams inside one
  * doc, short docs, every interleaving the generator produces.
  */
class DedupDifferentialSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-memory reference for [[Dedup.exactSubstrDedup]]: corpus-wide first
    * occurrence of every L-gram in (doc_id, pos) order; non-first window
    * starts mark [pos, pos+L-1]; kept tokens = those under no interval.
    */
  private def referenceExactSubstr(
      docs: Seq[(Long, String)],
      L: Int
  ): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val firstSeen = scala.collection.mutable.HashMap[Seq[String], (Long, Int)]()
    for ((id, t) <- toks.sortBy(_._1); i <- 0 to t.length - L) {
      val g = t.slice(i, i + L)
      if (!firstSeen.contains(g)) firstSeen(g) = (id, i)
    }
    toks.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - L) {
        val g = t.slice(i, i + L)
        if (firstSeen(g) != ((id, i))) (i until i + L).foreach(covered(_) = true)
      }
      val kept = t.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> ((t.length.toLong, covered.count(identity).toLong, kept.mkString(" ")))
    }.toMap
  }

  /** In-memory reference for [[Dedup.winnowFrame]]: per doc, k-gram hashes
    * (same md5-16hex as the engine), sliding window of w, min hash with
    * ties to the rightmost position; census over the selected (hash, pos)
    * set.
    */
  private def referenceWinnow(
      text: String,
      k: Int,
      w: Int
  ): Option[(Long, Long, Long)] = {
    val t = text.split(" ", -1).toSeq.filter(_.nonEmpty)
    if (t.length < k) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val grams = (0 to t.length - k).map(i => h(t.slice(i, i + k).mkString(" ")))
    val ng    = grams.length
    if (ng < w) return None
    val selected = (0 to ng - w).map { j =>
      // min hash in window j..j+w-1, ties to the RIGHTMOST position
      (j until j + w).map(i => (grams(i), i)).minBy { case (g, i) => (g, -i) }
    }.distinct
    Some((ng.toLong, (ng - w + 1).toLong, selected.length.toLong))
  }

  private val rng = new scala.util.Random(20260814L)

  /** Random corpus from a SMALL vocabulary so duplicated runs arise
    * naturally, plus explicit cross-doc and within-doc copied spans.
    */
  private def randomCorpus(nDocs: Int): Seq[(Long, String)] = {
    val vocab = (1 to 12).map(i => s"w$i")
    def randomDoc(len: Int) = (1 to len).map(_ => vocab(rng.nextInt(vocab.length)))
    val base = (0 until nDocs).map { i =>
      i.toLong -> randomDoc(8 + rng.nextInt(40))
    }
    // splice copied spans into half the docs to force real duplicate runs;
    // the donor must itself be long enough to yield a >= 13-token span, or
    // the splice plants no guaranteed duplicate run
    val donors = base.filter(_._2.length >= 19)
    base.map { case (id, t) =>
      if (id % 2 == 1 && donors.nonEmpty) {
        val donor = donors(rng.nextInt(donors.length))._2
        val span  = donor.take(13 + rng.nextInt(6))
        val cut   = rng.nextInt(t.length + 1)
        id -> (t.take(cut) ++ span ++ t.drop(cut)).mkString(" ")
      } else id -> t.mkString(" ")
    }
  }

  test("exactSubstrDedup matches the in-memory reference on random spliced corpora") {
    for (trial <- 1 to 5) {
      val corpus = randomCorpus(6 + trial)
      val got = Dedup
        .exactSubstrDedup(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      val want = referenceExactSubstr(corpus, 13)
      assert(got === want, s"trial $trial diverged; corpus: ${corpus.take(3)}...")
    }
  }

  test("winnowFrame census matches the in-memory reference on random spliced corpora") {
    for (trial <- 1 to 5) {
      val corpus = randomCorpus(6 + trial)
      val got = Dedup
        .winnowFrame(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val want = corpus.flatMap { case (id, t) =>
        referenceWinnow(t, k = 4, w = 5).map(id -> _)
      }.toMap
      assert(got === want, s"trial $trial diverged")
    }
  }
}
