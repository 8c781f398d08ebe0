package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximation QUALITY pins for the ANN paths (round-6 directive 3).
  *
  * The plan specs prove the probes are cheap and the oracle proves they
  * compute what they claim — but a centroid-assignment bug that tanked
  * recall would pass both. These specs pin recall itself:
  *
  *   - IVF: probe top-5 recall vs the brute-force exact top-5 on the
  *     embeddings fixture, with multi-probe >= single-probe.
  *   - LSH: the fixture's vectors are near-random (best cosine ~0.33, and
  *     the true neighbors' buckets sit 3-6 sign-bits from the query's), so
  *     NO sub-linear probe can promise global-top-5 recall there — that
  *     number would pin noise. What sign-LSH does promise is recall of
  *     genuinely-near vectors (high cosine => few sign bits differ), so the
  *     LSH pins use PLANTED near-duplicates of the query vector
  *     (cos > 0.999) and assert the probe recovers them; plus the
  *     candidate-monotonicity and exact-within-candidates properties that
  *     hold on any input.
  */
class SimilarityRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topIds(name: String, k: Int): Seq[Long] =
    SparkEntry.queries(name)(spark, TestSpark.sfDir).collect().take(k).map(_.getLong(0)).toSeq

  private def recallAt5(probe: String): Double = {
    val exact = topIds("q_sim_topk", 5).toSet
    (topIds(probe, 5).toSet & exact).size / 5.0
  }

  // driver-side geometry twins of the Similarity signature expressions
  private def dot(x: Array[Float], p: Seq[Double]): Double =
    x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * p(i))
  private def bucket8(v: Array[Float]): Long =
    Similarity.planes.zipWithIndex.map { case (p, i) => if (dot(v, p) > 0) 1L << i else 0L }.sum
  private def bandSigs(v: Array[Float]): Seq[Long] =
    (0 until 4).map { b =>
      (0 until Similarity.bandBits)
        .map(j => if (dot(v, Similarity.bandPlanes(b * Similarity.bandBits + j)) > 0) 1L << j else 0L)
        .sum
    }
  private def cos(x: Array[Float], y: Array[Float]): Double = {
    var d = 0.0; var nx = 0.0; var ny = 0.0
    x.indices.foreach { i =>
      d += x(i).toDouble * y(i).toDouble; nx += x(i).toDouble * x(i).toDouble; ny += y(i).toDouble * y(i).toDouble
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Deterministic near-copies of `v` whose 8-bit probe signature differs in
    * >= 2 bits: the minimal-norm way to flip probe bit i is to reflect the
    * vector across hyperplane i (subtract (1+m) x its projection); doing it
    * for two of the four lowest-|margin| planes flips 2 bits while moving
    * the vector by almost nothing (cos > 0.98) and leaving whole bands of
    * the independent 32-bit banded signature clean.
    */
  private def flippedNearCopies(v0: Array[Float], n: Int): Seq[Array[Float]] = {
    val q8       = bucket8(v0)
    val qBands   = bandSigs(v0)
    val byMargin = Similarity.planes.sortBy(p => math.abs(dot(v0, p)))
    def reflect(v: Array[Float], p: Seq[Double], m: Double): Array[Float] = {
      val coef = dot(v, p) / p.map(x => x * x).sum * (1.0 + m)
      v.zipWithIndex.map { case (x, i) => (x - coef * p(i)).toFloat }
    }
    val found = (for {
      i1 <- (0 until 4).iterator
      i2 <- (i1 + 1 until 4).iterator
      v = reflect(reflect(v0, byMargin(i1), 0.2), byMargin(i2), 0.2)
      if java.lang.Long.bitCount(bucket8(v) ^ q8) >= 2 // cross-terms can undo a flip; keep real 2+-flip vectors
      if bandSigs(v).zip(qBands).exists { case (a, b) => a == b }
      if cos(v0, v) > 0.98
    } yield v).take(n).toSeq
    assert(found.size === n, s"the deterministic reflection schedule must yield $n qualifying vectors")
    found
  }

  test("IVF probe recall@5 vs brute force >= 0.7; multi-probe never worse") {
    val r1 = recallAt5("q_sim_ivf_probe")
    val r2 = recallAt5("q_sim_ivf_probe2")
    assert(r1 >= 0.7, s"single-probe IVF recall@5 $r1 (fixture measures 0.8)")
    assert(r2 >= 0.7, s"multi-probe IVF recall@5 $r2 (fixture measures 0.8)")
    assert(r2 >= r1, s"searching 2 clusters must not lose candidates: $r2 < $r1")
  }

  test("LSH multi-probe similarities dominate single-probe at every rank") {
    // radius-1 candidates are a strict superset of radius-0's, and scoring
    // within candidates is exact — so the top-5 can only improve
    val one = SparkEntry.queries("q_sim_lsh_probe")(spark, TestSpark.sfDir).collect().map(_.getDouble(2))
    val two = SparkEntry.queries("q_sim_lsh_probe2")(spark, TestSpark.sfDir).collect().map(_.getDouble(2))
    assert(two.length >= one.length, "wider probe cannot return fewer rows")
    one.zip(two).zipWithIndex.foreach { case ((p1, p2), i) =>
      assert(p2 >= p1, s"rank $i: radius-1 ($p2) must be >= radius-0 ($p1)")
    }
  }

  /** Fixture plus 3 planted near-copies of the query vector: a component-wise
    * wiggle of +-0.01 keeps cosine > 0.998, so these are the "genuinely
    * near" neighbors LSH exists to find. Deterministic: fixed fixture,
    * fixed planes, fixed perturbation.
    */
  private def plantedFrame: (org.apache.spark.sql.DataFrame, Set[Long]) = {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "embedding")
    val q0  = emb.filter(col("vec_id") === 0).collect()(0).getSeq[Float](1)
    val planted = (1 to 3).map { j =>
      (900000L + j, q0.zipWithIndex.map { case (x, i) => x + 0.005f * (((i + j) % 5) - 2) })
    }
    (emb.union(planted.toDF("vec_id", "embedding")), planted.map(_._1).toSet)
  }

  test("LSH probe recovers planted near-duplicates of the query") {
    val (frame, plantedIds) = plantedFrame
    // sanity: the planted rows really are near-duplicates under exact cosine
    graft.functions.VectorFunctions.register(spark)
    val q = frame.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val sims = frame
      .filter(col("vec_id") >= 900000L)
      .crossJoin(broadcast(q))
      .select(expr("cosine_sim(embedding, q_emb)").as("c"))
      .collect()
      .map(_.getDouble(0))
    assert(sims.length === 3 && sims.forall(_ > 0.998), s"planted cosines: ${sims.mkString(",")}")

    // cos > 0.998 => angle ~ 3.6 degrees => each sign bit flips with
    // probability theta/pi ~ 1%; with the fixed planes the buckets are
    // deterministic. Radius-0 must find most, radius-1 all three.
    val got0 = Similarity.lshProbe(frame, 0, maxHamming = 0, k = 5).collect().map(_.getLong(0)).toSet
    val got1 = Similarity.lshProbe(frame, 0, maxHamming = 1, k = 5).collect().map(_.getLong(0)).toSet
    assert((got0 & plantedIds).size >= 2, s"radius-0 must recover >= 2/3 planted near-dups, got $got0")
    assert((got1 & plantedIds).size === 3, s"radius-1 must recover all 3 planted near-dups, got $got1")
  }

  test("knn join recovers each query's planted near-duplicate at rank 1") {
    // the batched shape of the planted-recovery guarantee: when the corpus
    // holds a genuine near-copy of a query vector, that query's top-k must
    // surface it first — the dedup-against-another-dataset contract
    val emb = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val planted = queries.collect().map { r =>
      val id = r.getLong(0)
      val v  = r.getSeq[Float](1)
      (900000L + id, v.zipWithIndex.map { case (x, i) => x + 0.005f * (((i + id.toInt) % 5) - 2) })
    }.toSeq
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") >= 3).union(planted.toDF("vec_id", "embedding"))
    val top = Similarity.knnJoin(queries, corpus, k = 3, maxHamming = 1).collect()
    (0L until 3L).foreach { qid =>
      val rank1 = top.find(r => r.getLong(0) == qid && r.getLong(1) == 1L)
        .getOrElse(fail(s"query $qid returned no rows"))
      assert(rank1.getLong(2) === 900000L + qid,
        s"query $qid must surface its planted near-copy first, got ${rank1.getLong(2)}")
      assert(rank1.getDouble(3) > 0.99, s"planted cosine should be ~1, got ${rank1.getDouble(3)}")
    }
  }

  test("knn join quantized scoring: identical candidates, planted near-dup still rank 1, scores within 0.05") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 3)
    val planted = queries.collect().map { r =>
      val id = r.getLong(0)
      val v  = r.getSeq[Float](1)
      (900000L + id, v.zipWithIndex.map { case (x, i) => x + 0.005f * (((i + id.toInt) % 5) - 2) })
    }.toSeq
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") >= 3).union(planted.toDF("vec_id", "embedding"))
    val exact = Similarity.knnJoin(queries, corpus, k = 3, maxHamming = 1).collect()
    val quant = Similarity.knnJoin(queries, corpus, k = 3, maxHamming = 1, scoreQuantized = true).collect()
    (0L until 3L).foreach { qid =>
      val rank1 = quant.find(r => r.getLong(0) == qid && r.getLong(1) == 1L)
        .getOrElse(fail(s"query $qid returned no rows"))
      assert(rank1.getLong(2) === 900000L + qid,
        s"quantized scoring must still surface the planted near-copy first, got ${rank1.getLong(2)}")
    }
    // buckets come from the float embedding either way -> same (q, vec) result
    // universe; scores agree within the int8 error bound
    val exactScores = exact.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    quant.foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(2))).foreach { e =>
        assert(math.abs(e - r.getDouble(3)) <= 0.05,
          s"(${r.getLong(0)}, ${r.getLong(2)}): quantized ${r.getDouble(3)} vs exact $e")
      }
    }
  }

  test("embedNearDupPairs surfaces a planted same-label near-dup pair, and only same-label pairs") {
    // round-7 finding #3: q_dedup_embed's gate row-count can be 0=0, so a
    // broken join predicate (e.g. =!= on label) would still hash-match.
    // This pins the PAIR GENERATOR itself: two planted near-copies of
    // vector 0 sharing its label must come back as pairs; a byte-identical
    // near-copy under a DIFFERENT label must not pair with them.
    import spark.implicits._
    val emb  = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "label", "embedding")
    val row0 = emb.filter(col("vec_id") === 0).collect()(0)
    val lbl  = row0.getInt(1)
    val base = row0.getSeq[Float](2)
    def wiggle(j: Int) = base.zipWithIndex.map { case (x, i) => x + 0.005f * (((i + j) % 5) - 2) }
    val planted = Seq(
      (910001L, lbl, wiggle(1)),     // near-copy, same label
      (910002L, lbl, wiggle(2)),     // near-copy, same label
      (910003L, lbl + 1, wiggle(1))  // SAME vector as 910001 under another label: must never pair
    ).toDF("vec_id", "label", "embedding")
    val frame = emb.union(planted.select("vec_id", "label", "embedding"))

    val got = Similarity.embedNearDupPairs(frame).collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(
      pairs === Set((0L, 910001L), (0L, 910002L), (910001L, 910002L)),
      s"exactly the same-label planted trio must pair (fixture max cosine ~0.34 stays under 0.85): $pairs"
    )
    got.foreach(r => assert(r.getDouble(2) > 0.99, s"planted pair cosine should be ~1: $r"))
  }

  test("banded LSH recovers planted near-dups that radius-1 enumeration misses, at comparable candidate cost") {
    // The round-7 rationale for capping lshProbe at radius 1: radius >= 2
    // belongs to a banded design. This pins that claim. Construction: the
    // minimal-norm way to flip probe sign bit i is to reflect the query
    // across hyperplane i (subtract (1+m) * its projection); doing that for
    // the two probe planes with the smallest |dot| margins flips 2 bits of
    // the 8-bit signature while moving the vector by almost nothing —
    // cos > 0.98, and the 32 independent band planes keep whole bands
    // clean. Such a vector sits OUTSIDE radius-1's enumerated buckets by
    // construction; the banded probe must recover it (some band matches),
    // and the banded candidate set over the original corpus must stay
    // comparable to radius-1's (~4/256 vs 9/256 of the corpus). All
    // deterministic: fixed fixture, fixed planes, fixed margins.
    graft.functions.VectorFunctions.register(spark)
    val emb  = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "embedding")
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val vecs = rows.toMap

    val qv     = vecs(0L)
    val q8     = bucket8(qv)
    val qBands = bandSigs(qv)
    val planted = flippedNearCopies(qv, 3)

    val plantedIds = (0 until 3).map(i => 920001L + i).toSet
    val frame = emb.union(
      planted.zipWithIndex.map { case (v, i) => (920001L + i, v.toSeq) }.toDF("vec_id", "embedding")
    )
    val r1     = Similarity.lshProbe(frame, 0, maxHamming = 1, k = 5).collect().map(_.getLong(0)).toSet
    val banded = Similarity.bandedProbe(frame, 0, bands = 4, k = 5).collect().map(_.getLong(0)).toSet
    assert((r1 & plantedIds).isEmpty, s"radius-1 cannot reach Hamming >= 2 by construction: $r1")
    assert(plantedIds.subsetOf(banded), s"banded probe must recover all 3 planted near-dups, got $banded")

    // comparable candidate cost, measured on the original corpus
    val r1Cand     = rows.count { case (id, v) => id != 0L && java.lang.Long.bitCount(bucket8(v) ^ q8) <= 1 }
    val bandedCand = rows.count { case (id, v) => id != 0L && bandSigs(v).zip(qBands).exists { case (a, b) => a == b } }
    assert(
      bandedCand <= 2 * math.max(r1Cand, 1),
      s"banded candidates ($bandedCand) must stay comparable to radius-1's ($r1Cand)"
    )
  }

  test("banded pair generator finds a planted cross-bucket near-dup pair that the single-bucket generator misses") {
    // the dedup counterpart of the probe pin above: a same-label near-copy
    // whose 8-bit signature differs in >= 2 bits shares NO bucket with its
    // twin, so embedNearDupPairs structurally cannot pair them; the banded
    // generator must (some 8-bit band of the 32 is clean by construction).
    import spark.implicits._
    val emb  = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "label", "embedding")
    val row0 = emb.filter(col("vec_id") === 0).collect()(0)
    val lbl  = row0.getInt(1)
    val base = row0.getSeq[Float](2).toArray
    val twin = flippedNearCopies(base, 1).head
    val frame = emb.union(
      Seq((930001L, lbl, twin.toSeq)).toDF("vec_id", "label", "embedding")
    )
    val single = Similarity.embedNearDupPairs(frame).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.bandedNearDupPairs(frame).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((0L, 930001L)),
      s"bucket-blocked generator cannot see across a 2-bit signature flip: $single")
    assert(banded.contains((0L, 930001L)),
      s"banded generator must pair the planted cross-bucket near-dup: $banded")
  }

  test("LSH probe is exact within its candidate set") {
    // the probe's top-5 must equal the brute-force cosine ranking restricted
    // to same-bucket candidates — approximate in WHICH rows it considers,
    // never in how it scores them
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.sfDir).select("vec_id", "embedding")
    val got = Similarity.lshProbe(emb, 0, maxHamming = 0, k = 5).collect().map(_.getLong(0)).toSeq

    // expected: compute buckets + cosines driver-side from the raw floats
    val rows = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val vecs = rows.toMap
    def dot(x: Array[Float], y: Seq[Double]): Double =
      x.indices.foldLeft(0.0)((acc, i) => acc + x(i).toDouble * y(i))
    def bucket(v: Array[Float]): Long =
      Similarity.planes.zipWithIndex.map { case (p, i) => if (dot(v, p) > 0) 1L << i else 0L }.sum
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      x.indices.foreach { i => d += x(i).toDouble * y(i).toDouble; nx += x(i).toDouble * x(i).toDouble; ny += y(i).toDouble * y(i).toDouble }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val qv = vecs(0L)
    val qb = bucket(qv)
    val expected = rows.toSeq
      .filter { case (id, v) => id != 0L && bucket(v) == qb }
      .map { case (id, v) => (id, math.rint(cos(qv, v) * 1e6) / 1e6) }
      .sortBy { case (id, c) => (-c, id) }
      .take(5)
      .map(_._1)
    assert(got === expected, s"probe must be the exact top-5 of its bucket: got $got expected $expected")
  }

  test("label-centroid margin: tight clusters cohere, a planted mislabeled vector is the one confusable point") {
    // two orthogonal directions, tight noise: label 0 lives on +e0, label 1
    // on +e1. Vector 9 carries label 0 but sits on +e1 — the mislabel.
    val dim = 8
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0.0f); a(axis) = 1.0f; a((axis + 2) % dim) = eps; a
    }
    val rows =
      (0L to 3L).map(i => (i, v(0, 0.01f * (i + 1)), 0)) ++
        (4L to 7L).map(i => (i, v(1, 0.01f * (i + 1)), 1)) :+
        ((9L, v(1, 0.05f), 0)) // mislabeled: label 0, but an e1 vector
    val emb = rows.toDF("vec_id", "embedding", "label")
    val byName = Similarity
      .labelCentroidMargin(emb)
      .collect()
      .map(r =>
        r.getAs[Int]("label") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_intra"),
            r.getAs[Double]("mean_margin"), r.getAs[Long]("n_misassigned"))))
      .toMap
    assert(byName(0)._1 === 5L && byName(1)._1 === 4L)
    // label 1 is pure: high cohesion, positive margin, nothing misassigned
    assert(byName(1)._2 > 0.9, s"pure cluster must cohere: ${byName(1)}")
    assert(byName(1)._3 > 0.5, s"pure cluster must separate: ${byName(1)}")
    assert(byName(1)._4 === 0L)
    // label 0 contains exactly the planted mislabel as its confusable point
    assert(byName(0)._4 === 1L, s"the planted mislabel must be the one confusable point: ${byName(0)}")
  }
}
