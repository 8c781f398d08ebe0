package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Planted cases for the LSH-blocked DBSCAN census: the three point
  * classes land exactly where Ester et al.'s definitions put them, border
  * ties break deterministically to the MIN cluster, and singleton cores
  * label themselves.
  */
class DbscanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def census(
      pairs: Seq[(Long, Long)],
      universe: Seq[Long],
      minPts: Int = 2
  ): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Similarity
      .dbscanFromPairs(
        pairs.toDF("vec_a", "vec_b"),
        universe.toDF("vec_id"),
        minPts
      )
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("core / border / noise classes land per the textbook definitions") {
    // 1-2-3 chain: 2 has deg 2 (core), 1 and 3 deg 1 (borders of 2's
    // cluster); 4-5 pair: both deg 1 (non-core, and no core neighbor ->
    // NOISE — the pair that density clustering refuses to call a cluster);
    // 6 isolated -> noise
    val got = census(Seq((1L, 2L), (2L, 3L), (4L, 5L)), Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got(2L) === ((1L, 2L, 3L)), s"cluster 2 = one core + two borders: $got")
    assert(got(-1L) === ((0L, 0L, 3L)), s"4, 5, 6 are noise: $got")
    assert(got.keySet === Set(2L, -1L))
  }

  test("clusters are CCs of the CORE-CORE subgraph; a border bridging two clusters joins the MIN") {
    // minPts 3: two K4s (every member deg 3 = core) bridged by node 10
    // adjacent to one core of each (deg 2 < 3 -> BORDER): 10 must join
    // min(cluster 1, cluster 5) = 1, and the bridge must NOT merge the
    // two core components (borders carry no density)
    def k4(a: Long, b: Long, c: Long, d: Long) =
      Seq((a, b), (a, c), (a, d), (b, c), (b, d), (c, d))
    val got = census(
      k4(1L, 2L, 3L, 4L) ++ k4(5L, 6L, 7L, 8L) ++ Seq((4L, 10L), (5L, 10L)),
      (1L to 8L) ++ Seq(10L, 99L),
      minPts = 3
    )
    assert(got(1L) === ((4L, 1L, 5L)), s"K4 1-2-3-4 + border 10: $got")
    assert(got(5L) === ((4L, 0L, 4L)), s"K4 5-6-7-8 stays separate: $got")
    assert(got(-1L) === ((0L, 0L, 1L)), s"only 99 is noise: $got")
  }

  test("a core with no core neighbor is its own singleton cluster") {
    // 2 is core (deg 2) but its neighbors are non-core: cluster {2} with
    // two borders; raising minPts to 3 demotes everything
    val got = census(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L))
    assert(got(2L) === ((1L, 2L, 3L)))
    val strict = census(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L), minPts = 3)
    assert(strict === Map(-1L -> ((0L, 0L, 3L))), s"minPts 3 demotes the chain to noise: $strict")
  }

  test("fixture run agrees with the oracle's class accounting shape") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sfDir)
    val rows = Similarity
      .dbscanFromPairs(Similarity.embedNearDupPairs(emb, threshold = 0.0), emb)
      .collect()
    val total = emb.count()
    assert(rows.map(_.getLong(3)).sum === total, "every vector is core, border, or noise exactly once")
    assert(rows.count(_.getLong(0) == -1L) === 1, "exactly one noise row")
  }
}
