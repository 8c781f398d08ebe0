package graft.operators

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: planted boundary cases (exact fill, doc split
  * across chunks, short docs) against an in-memory reference packer,
  * plus fixture-level conservation between the census, the per-sequence
  * manifest, and the materialized [[PackSequences.emit]] arrays.
  */
class PackSequencesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyMerges =
    Seq.empty[(Long, String, String)].toDF("round", "a", "b")

  /** In-memory reference: whitespace-encode docs (no merges), rank ids
    * by (freq desc, token asc) starting at 1, concat per lang in doc_id
    * order with EOS(0) after each doc, chunk into seqLen rows, pad the
    * tail with 0.
    */
  private def referencePack(
      docs: Seq[(Long, String, String)],
      seqLen: Int
  ): Map[(String, Long), Vector[Int]] = {
    val toks = docs.flatMap { case (_, _, t) => t.split(" ").toSeq }
    val ids = toks
      .groupBy(identity)
      .map { case (t, xs) => (t, xs.size) }
      .toSeq
      .sortBy { case (t, n) => (-n, t) }
      .zipWithIndex
      .map { case ((t, _), i) => t -> (i + 1) }
      .toMap
    docs
      .groupBy(_._2)
      .map { case (lang, ds) =>
        val stream = ds.sortBy(_._1).flatMap { case (_, _, t) => t.split(" ").map(ids) :+ 0 }.toVector
        val padded = stream ++ Vector.fill((seqLen - stream.size % seqLen) % seqLen)(0)
        lang -> padded.grouped(seqLen).toVector
      }
      .flatMap { case (lang, seqs) => seqs.zipWithIndex.map { case (s, i) => (lang, i.toLong) -> s } }
  }

  test("emit matches the reference packer on planted exact-fill, split and short docs") {
    val seqLen = 8
    // en: 3+1, 4+1, 7+1 tokens with EOS -> 17 tokens = 2 seqs + 1 pad;
    //     doc 30 (7 tokens, start 10) SPLITS across seqs 1..2
    // fr: 7+1 tokens -> EXACT fill of one 8-token sequence (pad 0)
    // zh: 1+1 tokens -> short doc, one mostly-padded sequence
    val docs = Seq(
      (10L, "en", "a b a"),
      (20L, "en", "b b c d"),
      (30L, "en", "a a a b c d e"),
      (11L, "fr", "x y x y z z w"),
      (12L, "zh", "q")
    ).map { case (id, lang, text) => (id, lang, text) }
    val df  = docs.toDF("doc_id", "lang", "text")
    val got = PackSequences
      .emit(df, emptyMerges, seqLen)
      .collect()
      .map(r =>
        (r.getString(0), r.getLong(1)) ->
          (r.getSeq[Int](2).toVector, r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val want = referencePack(docs, seqLen)
    assert(got.keySet === want.keySet, "sequence key set must match the reference")
    want.foreach { case (k, ids) =>
      val (gotIds, nTokens, nPad, nEos) = got(k)
      assert(gotIds === ids, s"sequence $k ids must match the reference")
      assert(gotIds.size === seqLen, s"sequence $k must be exactly $seqLen ids")
      val realTokens = k match {
        case ("fr", 0L) => 8L // exact fill: all 8 cells are real
        case ("zh", 0L) => 2L // short doc: token + EOS, 6 pads
        case _          => nTokens
      }
      assert(nTokens === realTokens, s"sequence $k n_tokens")
      assert(nPad === seqLen - nTokens, s"sequence $k pad accounting")
      // EOS cells (doc boundaries landing in this sequence), never pads
      val eosInRef = ids.take(nTokens.toInt).count(_ == 0)
      assert(nEos === eosInRef.toLong, s"sequence $k n_eos")
    }
    // the fr stream fills its one sequence exactly: no ghost empty
    // sequence, zero pad
    assert(got(("fr", 0L))._3 === 0L, "exact fill must carry zero pad")
    assert(!got.contains(("fr", 1L)), "exact fill must not spawn an empty tail sequence")
  }

  test("census math on the planted corpus: splits, pads, fill ppm") {
    // replicate q_pack_sequences' integer math on the planted stream:
    // en has 17 tokens over seqLen 8 -> 3 sequences, 7 pad, and TWO
    // split docs (doc 20 spans positions 4..8 across the first
    // boundary, doc 30 spans 9..16 across the second)
    val L      = 8L
    val counts = Seq(4L, 5L, 8L) // en docs incl. EOS
    val total  = counts.sum
    val starts = counts.scanLeft(0L)(_ + _).init
    val nSplit = starts.zip(counts).count { case (s, c) => s / L != (s + c - 1) / L }
    assert(total === 17L && nSplit === 2)
    val nSeq = (total + L - 1) / L
    assert(nSeq === 3L && nSeq * L - total === 7L)
    assert(total * 1000000L / (nSeq * L) === 708333L)
  }

  test("fixture conservation: census == manifest == emitted arrays") {
    val census = SparkEntry
      .queries("q_pack_sequences")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // integer identities per lang
    census.foreach { case (lang, (_, total, nSeq, _, pad, ppm)) =>
      assert(nSeq * PackSequences.SeqLen === total + pad, s"$lang: nSeq*L == total + pad")
      assert(ppm === total * 1000000L / (nSeq * PackSequences.SeqLen), s"$lang: fill ppm")
    }
    val rows = SparkEntry
      .queries("q_pack_sequences_rows")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // manifest tokens + pads conserve the census totals per lang
    // (sf0.001 is far under the 500-row limit, so the manifest is total)
    val manifest = rows.groupBy(_._1).map { case (lang, rs) => lang -> (rs.map(_._3).sum, rs.map(_._4).sum, rs.size) }
    census.foreach { case (lang, (_, total, nSeq, _, pad, _)) =>
      val (mTokens, mPad, mSeqs) = manifest(lang)
      assert(mTokens === total, s"$lang: manifest seq_tokens sum == census total_tokens")
      assert(mPad === pad, s"$lang: manifest pad sum == census pad_tokens")
      assert(mSeqs.toLong === nSeq, s"$lang: manifest row count == census n_sequences")
    }
    // the materialized arrays agree with the census: per lang, number of
    // emitted sequences and total non-pad cells
    val docs = graft.Tables.documents(spark, TestSpark.sfDir)
    val emitted = PackSequences
      .emit(docs, Bpe.trainedMerges(spark, TestSpark.sfDir), PackSequences.SeqLen)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_seq"), sum(col("n_tokens")).as("tok"), sum(col("n_eos")).as("eos"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docCounts = docs.groupBy(col("lang")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    census.foreach { case (lang, (nDocs, total, nSeq, _, _, _)) =>
      val (eSeq, eTok, eEos) = emitted(lang)
      assert(eSeq === nSeq, s"$lang: emitted sequence count == census")
      assert(eTok === total, s"$lang: emitted non-pad cells == census total_tokens")
      assert(eEos === nDocs && nDocs === docCounts(lang), s"$lang: one EOS per doc")
    }
  }
}
