package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Brute-force differential for sequence packing: random corpora
  * (random langs, random word streams over a small alphabet with
  * deliberate duplicate texts, random sequence lengths) against an
  * in-memory reference packer of the same concat-and-chunk rule —
  * [[PackSequences.emit]]'s id arrays and per-sequence accounting
  * (n_tokens / n_pad / n_eos) must match exactly. The planted spec pins
  * three shapes (exact fill, boundary split, short doc); this pins the
  * rule over arbitrary shapes, including multi-doc boundary pileups and
  * the duplicate-text fanout through the distinct-encode join.
  */
object PackSequencesProps extends Properties("PackSequencesOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  /** Reference: zero-merge encode = whitespace words; ids dense-ranked
    * by (corpus frequency desc, token asc) from 1 (0 = EOS/PAD); per
    * lang concat in doc_id order with one EOS per doc; chunk to seqLen;
    * pad the tail with 0. Mirrors the q_bpe_vocab_ids ranking rule and
    * the emit chunk math exactly, all in plain Scala collections.
    */
  private def referencePack(
      docs: Seq[(Long, String, String)],
      seqLen: Int
  ): Map[(String, Long), (Vector[Int], Long, Long, Long)] = {
    val ids = docs
      .flatMap { case (_, _, t) => t.split(" ").toSeq }
      .groupBy(identity)
      .map { case (t, xs) => (t, xs.size) }
      .toSeq
      .sortBy { case (t, n) => (-n, t) }
      .zipWithIndex
      .map { case ((t, _), i) => t -> (i + 1) }
      .toMap
    docs
      .groupBy(_._2)
      .flatMap { case (lang, ds) =>
        val stream = ds.sortBy(_._1).flatMap { case (_, _, t) => t.split(" ").map(ids) :+ 0 }.toVector
        stream.grouped(seqLen).zipWithIndex.map { case (chunk, i) =>
          val real = chunk.size // < seqLen only on the tail chunk
          val row = (
            chunk ++ Vector.fill(seqLen - real)(0),
            real.toLong,
            (seqLen - real).toLong,
            chunk.count(_ == 0).toLong
          )
          (lang, i.toLong) -> row
        }
      }
  }

  private val cases: Gen[(List[(Long, String, String)], Int)] =
    for {
      n      <- Gen.chooseNum(1, 10)
      langs  <- Gen.listOfN(n, Gen.oneOf("en", "fr", "zh"))
      // small word alphabet (incl. multi-char words): id-ranking ties,
      // duplicate texts, and cross-lang shared vocab all happen
      texts <- Gen.listOfN(
        n,
        Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, Gen.oneOf("a", "b", "c", "ab", "cd", "e"))))
      seqLen <- Gen.oneOf(4, 5, 8, 13)
    } yield (langs.zip(texts).zipWithIndex.map { case ((lang, ws), i) =>
      // doc_ids unique but non-dense and not in generation order
      ((i * 7 + 3).toLong, lang, ws.mkString(" "))
    }, seqLen)

  property("emit matches an in-memory reference packer on arbitrary corpora") =
    Prop.forAll(cases) { case (docs, seqLen) =>
      import spark.implicits._
      val df     = docs.toDF("doc_id", "lang", "text")
      val merges = Seq.empty[(Long, String, String)].toDF("round", "a", "b")
      val got = PackSequences
        .emit(df, merges, seqLen)
        .collect()
        .map(r =>
          (r.getString(0), r.getLong(1)) ->
            ((r.getSeq[Int](2).toVector, r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      val want = referencePack(docs, seqLen)
      val keys = got.keySet == want.keySet
      val rows = keys && want.forall { case (k, w) => got(k) == w }
      // conservation: every emitted row is exactly seqLen wide, and per
      // lang the EOS count equals the doc count (no boundary lost to a
      // chunk edge), pads only on the tail sequence
      val widths = got.values.forall(_._1.size == seqLen)
      val eosTotal = docs
        .groupBy(_._2)
        .forall { case (lang, ds) =>
          got.collect { case ((l, _), (_, _, _, e)) if l == lang => e }.sum == ds.size.toLong
        }
      (keys :| "sequence key sets differ") &&
      (rows :| "ids or accounting differ from the reference") &&
      (widths :| "a sequence is not exactly seqLen wide") &&
      (eosTotal :| "per-lang EOS count != doc count")
    }
}
