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
}
