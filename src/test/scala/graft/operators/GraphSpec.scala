package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the purchase-graph analytics family at
  * sf0.001 (150 customers, 10 suppliers — every supplier lands in the
  * top-10/top-20 outputs, which makes whole-side properties checkable
  * from the gate queries' own bounded results).
  */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("pagerank: descending order, positive mass, hubs (suppliers) dominate the top ranks") {
    val rows = SparkEntry
      .queries("q_graph_pagerank")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.length === 20)
    assert(rows.forall(_._2 > 0.0))
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 }, "scores must be non-increasing")
    // with 150 customers vs 10 suppliers, supplier degree is ~14x customer
    // degree — all 10 suppliers must outrank every customer
    val top10 = rows.take(10).map(_._1)
    assert(top10.forall(_.startsWith("s")), s"top-10 must be suppliers: ${top10.mkString(",")}")
    assert(top10.toSet.size === 10)
  }

  test("pagerank: a supplier's score strictly exceeds the uniform prior (it received real mass)") {
    val rows = SparkEntry
      .queries("q_graph_pagerank")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val uniform = 1.0 / 160 // 150 customers + 10 suppliers
    rows.take(10).foreach { case (node, score) =>
      assert(score > uniform, s"$node: $score must exceed the uniform prior $uniform")
    }
  }

  test("trustrank: whitelist suppliers hold the top trust ranks, scores are positive and descending") {
    import org.apache.spark.sql.functions._
    val seedKeys = graft.Tables
      .supplier(spark, TestSpark.sfDir)
      .join(graft.Tables.nation(spark, TestSpark.sfDir), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, TestSpark.sfDir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("s_suppkey")
      .collect()
      .map(r => s"s${r.getLong(0)}")
      .toSet
    assert(seedKeys.nonEmpty, "fixture sanity: EUROPE has suppliers")
    val rows = SparkEntry
      .queries("q_graph_trustrank")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.forall(_._2 > 0.0))
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
    // the teleport is restricted to the whitelist, so the seeds themselves
    // outrank every flow-only node
    assert(rows.take(seedKeys.size).map(_._1).toSet === seedKeys,
      s"top-${seedKeys.size} must be the seed whitelist: ${rows.take(seedKeys.size).mkString(",")}")
  }

  test("hits: authority vector is L2-normalized (all 10 suppliers are in the output at sf0.001)") {
    val auth = SparkEntry
      .queries("q_graph_hits")(spark, TestSpark.sfDir)
      .collect()
      .map(_.getDouble(1))
    assert(auth.length === 10)
    val sumSq = auth.map(a => a * a).sum
    assert(math.abs(sumSq - 1.0) < 1e-6, s"sum of squared authorities $sumSq must be ~1")
    assert(auth.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("label propagation: monotone non-increasing label count, converges to one component") {
    val rows = SparkEntry
      .queries("q_graph_components")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (-1L +: (0L to 4L)))
    val census = rows.filter(_._1 >= 0)
    assert(census.sliding(2).forall { case Array(a, b) => b._2 <= a._2 }, "label count must shrink")
    assert(census.head._2 === 160L, "round 0: every node its own label (150 customers + 10 suppliers)")
    // the purchase graph at sf0.001 is one dense component: min label 0
    // (customer 0) wins everywhere within the 4 rounds
    assert(census.last._2 === 1L, s"must converge to a single component: ${census.mkString(",")}")
    // the round = -1 row is the TRUE converged component count from the
    // pointer-doubling CC — which the 4-round census here happens to reach
    assert(rows.head === ((-1L, 1L, 0L)), s"true CC row: ${rows.head}")
    assert(rows.forall(_._3 === 0L))
  }

  test("triangle count: degree orientation bounds wedge enumeration on a planted hub, count stays exact") {
    import spark.implicits._
    // pure 1000-leaf star: id-based orientation would leave the hub with
    // ~500 out-edges and the wedge self-join would enumerate ~125k pairs
    // through one key; degree orientation points every edge leaf->hub, so
    // NO node has two out-edges and the wedge frame is EMPTY
    val star = (1L to 1000L).map(i => (0L, i)).toDF("pa", "pb")
    val maxOut = Graph
      .orientByDegree(star)
      .groupBy("u").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect().head.getLong(0)
    assert(maxOut === 1L, s"star must orient leaf->hub everywhere: max out-degree $maxOut")
    assert(Graph.triangleCount(star).collect().head.getLong(0) === 0L)

    // planted triangles survive the orientation: {1,2,3} + the three
    // hub-closed ones {0,1,2}, {0,1,3}, {0,2,3}
    val tri = star.unionByName(Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb"))
    assert(Graph.triangleCount(tri).collect().head.getLong(0) === 4L)
    // the bound holds with the hub present: max out-degree is the planted
    // nodes' O(sqrt(m)) = 3, never the hub's 1000
    val maxOutTri = Graph
      .orientByDegree(tri)
      .groupBy("u").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect().head.getLong(0)
    assert(maxOutTri <= 3L, s"degree orientation must keep out-degrees O(sqrt(m)): $maxOutTri")
  }

  test("adamic-adar: hub candidates are capped with a visible metric, scores keep the TRUE degree") {
    import spark.implicits._
    val star = (1L to 1000L).map(i => (0L, i)).toDF("pa", "pb")
    val cap  = 16
    val metrics = graft.sources.Sinks.captureObservedMetrics(spark, Set("graft.graph_wedges")) {
      val got = Graph.adamicAdarScores(star, cap).collect()
      // bounded join output: C(16,2) = 120 candidate pairs, not C(1000,2) = 499500
      assert(got.length === 120, s"candidates must be capped: ${got.length}")
      got.foreach { r =>
        assert(r.getLong(2) === 1L, "one shared neighbor (the hub)")
        // 1/ln(deg) uses the hub's TRUE degree (1000), not the capped list size
        assert(math.abs(r.getDouble(3) - 1.0 / math.log(1000.0)) < 1e-6, r.toString)
      }
    }
    val m = metrics("graft.graph_wedges")
    assert(m.getAs[Long]("capped_buckets") >= 1L, s"the drop must be observable: $m")
    assert(m.getAs[Int]("max_bucket") === 1000, s"the hub's full neighbor list was seen: $m")

    // with the cap above the max degree the generator is exact: path 1-2-3
    // yields the single candidate (1,3) through 2, score 1/ln(2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val rows = Graph.adamicAdarScores(path).collect()
    assert(rows.length === 1)
    assert((rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2)) === ((1L, 3L, 1L)))
    assert(math.abs(rows.head.getDouble(3) - 1.0 / math.log(2.0)) < 1e-6)
  }

  test("triangle census matches an in-memory recomputation on the thresholded graph") {
    val edges = graft.Tables
      .lineitem(spark, TestSpark.sfDir)
      .selectExpr("l_orderkey as o", "l_partkey as p")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        val ps = rows.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .groupBy(identity)
      // NOT `.collect { case (pair, occ) ... => pair }` — collect on a Map
      // producing 2-tuples rebuilds a MAP, silently collapsing pairs that
      // share a first element
      .filter(_._2.size >= 2)
      .keySet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expTri = edges.toSeq.map { case (a, b) =>
      (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size.toLong
    }.sum
    val degs = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2)).groupBy(identity).values.map(_.size.toLong)
    val expWedges = degs.map(d => d * (d - 1) / 2).sum
    val row = SparkEntry.queries("q_graph_triangles")(spark, TestSpark.sfDir).collect().head
    assert(row.getLong(1) === edges.size.toLong, "edge count")
    assert(row.getLong(2) === expWedges, "wedge count")
    assert(row.getLong(3) === expTri, "triangle count")
  }

  test("adamic-adar: top-ranked candidates match an in-memory recomputation, none is an edge") {
    val edges = graft.Tables
      .lineitem(spark, TestSpark.sfDir)
      .selectExpr("l_orderkey as o", "l_partkey as p")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        val ps = rows.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .groupBy(identity)
      .filter(_._2.size >= 2)
      .keySet
    val neighbors = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    def aa(a: Long, c: Long): (Long, Double) = {
      val common = neighbors(a) & neighbors(c)
      (common.size.toLong,
        common.toSeq.map(b => BigDecimal(1.0 / math.log(neighbors(b).size.toDouble)).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }
    val got = SparkEntry
      .queries("q_graph_adamic_adar")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 15)
    got.foreach { case (a, c, nCommon, score) =>
      assert(a < c, "candidate pairs are oriented")
      assert(!edges.contains((a, c)), s"($a,$c) is already an edge — link prediction must exclude it")
      val (expN, expScore) = aa(a, c)
      assert(nCommon === expN, s"($a,$c) common-neighbor count")
      assert(math.abs(score - expScore) < 1e-5, s"($a,$c): $score vs $expScore")
    }
    assert(got.map(_._4).sliding(2).forall { case Array(x, y) => x >= y })
  }

  test("k-core peel: a planted triangle-with-tail peels to the triangle, census rows match by hand") {
    import spark.implicits._
    // triangle {1,2,3} with a tail 3-4-5: k=2 peels node 5 (deg 1) in
    // round 1, node 4 in round 2, then stabilizes on the triangle
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val rows = Graph
      .kcoreCensus(g, 2, shownRounds = 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows === Array(
      (-1L, 3L, 3L), // converged: the triangle
      (0L, 5L, 5L),
      (1L, 4L, 4L),
      (2L, 3L, 3L),
      (3L, 3L, 3L)   // stable repeat, like the oracle's unrolled chain
    ), rows.mkString(","))
    // k=3: the triangle itself dies (degree 2 everywhere) — empty core
    val core3 = Graph.kcoreCensus(g, 3, shownRounds = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(core3.head === ((-1L, 0L, 0L)), core3.mkString(","))
    // a peel that cannot converge within maxRounds THROWS instead of
    // silently emitting an unconverged round = -1 row (this graph needs 2
    // peel rounds at k=2)
    val ex = intercept[IllegalArgumentException] {
      Graph.kcoreCensus(g, 2, shownRounds = 0, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
  }

  test("random walks: every hop follows a real edge, the walk corpus is deterministic across runs") {
    val edges = graft.Tables
      .lineitem(spark, TestSpark.sfDir)
      .selectExpr("l_orderkey as o", "l_partkey as p")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        val ps = rows.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .groupBy(identity)
      .filter(_._2.size >= 2)
      .keySet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def run() = SparkEntry
      .queries("q_graph_walks")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run()
    assert(rows.length === adj.size.min(500), "one walk per node")
    rows.foreach { case (s0, n1, n2, n3) =>
      assert(adj(s0).contains(n1), s"hop 1 of $s0 -> $n1 must be an edge")
      assert(adj(n1).contains(n2), s"hop 2 of $s0: $n1 -> $n2 must be an edge")
      assert(adj(n2).contains(n3), s"hop 3 of $s0: $n2 -> $n3 must be an edge")
    }
    assert(run() === rows, "md5-driven hops must be bit-deterministic across runs")
  }

  test("multi-walk corpus at W=4 x L=8: every hop edge-valid, one row per (node, walk), walk-id salt diversifies") {
    import spark.implicits._
    // 5-cycle with a chord: every node has degree >= 2, so walks have
    // real choices and the walk-id salt has something to diversify
    val g   = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L), (1L, 3L)).toDF("pa", "pb")
    val adj = Map(
      1L -> Set(2L, 3L, 5L), 2L -> Set(1L, 3L), 3L -> Set(1L, 2L, 4L),
      4L -> Set(3L, 5L), 5L -> Set(1L, 4L))
    val rows = Graph.walkCorpus(g, hops = 8, walks = 4).collect()
    assert(rows.length === 5 * 4, "one row per (node, walk)")
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).distinct.length === 20)
    rows.foreach { r =>
      val path = r.getLong(0) +: (1 to 8).map(t => r.getLong(t + 1))
      path.sliding(2).foreach { case Seq(a, b) =>
        assert(adj(a).contains(b), s"hop $a -> $b of walk ${r.getInt(1)} from ${r.getLong(0)} must be an edge")
      }
    }
    // the walk id salts the hop hash: at least one start node's 4 walks
    // must not all collapse onto the same path
    val diverged = rows
      .groupBy(_.getLong(0))
      .values
      .exists(rs => rs.map(r => (1 to 8).map(t => r.getLong(t + 1)).toSeq).distinct.length > 1)
    assert(diverged, "walk-id salt must diversify the walks from one start node")
    // deterministic: a second run is bit-identical
    val again = Graph.walkCorpus(g, hops = 8, walks = 4).collect()
    assert(again.map(_.toString).sorted.toSeq === rows.map(_.toString).sorted.toSeq)
  }

  test("walk pairs: every skip-gram pair is within 2 hops on the graph, no self pairs, counts positive") {
    val edges = graft.Tables
      .lineitem(spark, TestSpark.sfDir)
      .selectExpr("l_orderkey as o", "l_partkey as p")
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .values
      .flatMap { rows =>
        val ps = rows.map(_._2).sorted
        for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
      }
      .groupBy(identity)
      .filter(_._2.size >= 2)
      .keySet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = SparkEntry
      .queries("q_graph_walk_pairs")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.forall(_._3 > 0L))
    rows.foreach { case (a, b, _) =>
      assert(a < b, "pairs are unordered-normalized")
      assert(adj(a).contains(b) || (adj(a) & adj(b)).nonEmpty,
        s"window-2 pair ($a,$b) must be within 2 hops")
    }
  }

  test("co-purchase edges: a pathological basket is capped with a visible metric, small baskets exact") {
    import spark.implicits._
    // one crawler-session order touching 300 parts (twice, so w >= 2
    // keeps its pairs) + two normal 2-part orders sharing a pair
    val hot = (1 to 2).flatMap(rep => (1L to 300L).map(p => (100L + rep, p)))
    val op  = (hot ++ Seq((1L, 500L), (1L, 501L), (2L, 500L), (2L, 501L))).toDF("o", "p")
    val cap = 16
    val metrics = graft.sources.Sinks.captureObservedMetrics(spark, Set("graft.copurchase_pairs")) {
      val edges = Graph.coPurchaseEdgesFrom(op, cap).collect().map(r => (r.getLong(0), r.getLong(1)))
      // the hot order contributes C(16,2) = 120 pairs (its 16 smallest
      // parts, each seen twice so w = 2), not C(300,2) = 44850; the
      // normal orders contribute (500, 501)
      assert(edges.length === 121, s"capped basket must bound the pair set: ${edges.length}")
      assert(edges.contains((500L, 501L)))
      assert(edges.filterNot(_ == ((500L, 501L))).forall { case (a, b) => a <= 16 && b <= 16 })
    }
    val m = metrics("graft.copurchase_pairs")
    assert(m.getAs[Long]("capped_buckets") === 2L, s"both hot-order buckets capped: $m")
    assert(m.getAs[Int]("max_bucket") === 300, s"the full basket was seen pre-cap: $m")
  }

  test("bfs census: a planted path measures exact hop distances, off-component nodes land in dist = -1") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a disconnected pair {6,7}: from the min node
    // (1), distances are 0..4 with one node each; 6 and 7 are unreached
    val g    = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L)).toDF("pa", "pb")
    val rows = Graph.bfsCensus(g).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((-1L, 2L), (0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)), rows.mkString(","))
    // a frontier that cannot settle within maxRounds throws (the path
    // needs 4 expansion rounds + 1 fixpoint confirmation)
    val ex = intercept[IllegalArgumentException](Graph.bfsCensus(g, maxRounds = 2).collect())
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
  }

  test("harmonic centrality: the planted path scores exact 1/d sums per seed, off-component nodes contribute 0") {
    import spark.implicits._
    // path 1-2-3-4-5 plus a disconnected pair {6,7}; with seedCount = 2
    // the seeds are {1, 2}. Per-term 1/d goes through the same
    // shortest-repr double -> decimal(., 12) cast the operator applies.
    def bd(x: Double) = BigDecimal(x.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L)).toDF("pa", "pb")
    val rows = Graph
      .harmonicCensus(g, seedCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq
    val h1 = Seq(1.0, 1.0 / 2, 1.0 / 3, 1.0 / 4).map(bd).sum.toDouble
    val h2 = Seq(1.0, 1.0, 1.0 / 2, 1.0 / 3).map(bd).sum.toDouble
    assert(rows === Seq((1L, 4L, h1), (2L, 4L, h2)), rows.mkString(","))
    // nodes 6/7 never appear in any seed's sum (disconnected = exactly 0
    // contribution — the property closeness centrality lacks)
    // a frontier that cannot settle within maxRounds throws
    val ex = intercept[IllegalArgumentException](
      Graph.harmonicCensusTracked(g, seedCount = 2, maxRounds = 2)._1.collect())
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
    // one loop serves ALL seeds: the empty graph emits no rows
    assert(Graph.harmonicCensus(Seq.empty[(Long, Long)].toDF("pa", "pb")).collect().isEmpty)
  }

  test("effective diameter: the planted path's 90%-mass distance, exact integer rule") {
    import spark.implicits._
    // path 1-2-3-4-5 + disconnected pair {6,7}, seeds {1, 2}: pair
    // histogram d1:3, d2:2, d3:2, d4:1 (total 8). Cumulative 3,5,7,8 —
    // the first d with 10*cum >= 9*8=72 is d=4 (70 < 72 at d=3: the
    // planted case where p90 IS the true depth, not an earlier shoulder)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L)).toDF("pa", "pb")
    val rows = Graph
      .effDiameterCensus(g, seedCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq
    assert(rows === Seq((-1L, 4L), (1L, 3L), (2L, 2L), (3L, 2L), (4L, 1L)), rows.mkString(","))
    // empty graph: no rows, no phantom -1
    assert(Graph.effDiameterCensus(Seq.empty[(Long, Long)].toDF("pa", "pb")).collect().isEmpty)
  }

  test("seeded label spreading: clamped seeds never move, labels reach unlabeled nodes, isolated nodes stay -1") {
    import spark.implicits._
    // path 1-2-3-4 with seeds 1->7 and 4->9, plus an unseeded island
    // {10,11}: labels spread inward (ties resolve to the smaller label 7),
    // seed 4 keeps 9 even though its neighborhood majority is 7 — the
    // clamp that separates this from unsupervised LPA — and the island
    // never receives a label
    val g     = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("pa", "pb")
    val seeds = Seq((1L, 7L), (4L, 9L)).toDF("node", "lbl")
    val rows = Graph
      .seededLabelsCensusTracked(g, seeds)._1
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .toSeq
    assert(rows === Seq((-1L, 2L), (7L, 3L), (9L, 1L)), rows.mkString(","))
  }

  test("path counts: a planted diamond yields sigma = 2 at its far corner, tendrils stay 1") {
    import spark.implicits._
    // diamond 1-2-4 / 1-3-4 with seeds {1, 2}: node 4 is reached from
    // seed 1 by TWO shortest 2-paths (sigma 2); from seed 2, node 3 is
    // the 2-path-ambiguous one (via 1 and via 4)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("pa", "pb")
    val rows = Graph
      .pathCountsCensus(g, seedCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toSeq
    assert(rows === Seq((1L, 3L, 1L, 2L), (2L, 3L, 1L, 2L)), rows.mkString(","))
    assert(Graph.pathCountsCensus(Seq.empty[(Long, Long)].toDF("pa", "pb")).collect().isEmpty)
  }

  test("betweenness: planted path-into-diamond accumulates chained deltas and the 1/2 sigma ratio") {
    import spark.implicits._
    // path 1-2-3 feeding diamond 3-4-6 / 3-5-6; seeds {1, 2}.
    // Seed 1 (depths 1:0 2:1 3:2 4:3 5:3 6:4, sigma(6)=2):
    //   delta(4)=delta(5)=(1/2)(1+0)=0.5, delta(3)=1.5+1.5=3, delta(2)=1+3=4
    // Seed 2 (depths 2:0 1:1 3:1 4:2 5:2 6:3): delta(4)=delta(5)=0.5,
    //   delta(3)=3, delta(1)=0 (leaf).
    // Betweenness (d>0 rows only): 3->6.0, 2->4.0, 4->1.0, 5->1.0,
    // 1->0.0, 6->0.0; n_seeds counts reached-at-d>0 rows per node.
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 6L), (5L, 6L)).toDF("pa", "pb")
    val rows = Graph
      .betweennessCensus(g, seedCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(
      rows === Seq((3L, 2L, 6.0), (2L, 1L, 4.0), (4L, 2L, 1.0), (5L, 2L, 1.0), (1L, 1L, 0.0),
        (6L, 2L, 0.0)),
      rows.mkString(","))
    // empty graph: no phantom rows
    assert(Graph.betweennessCensus(Seq.empty[(Long, Long)].toDF("pa", "pb")).collect().isEmpty)
  }

  test("bfs and sssp on an EMPTY graph emit no rows (no phantom NULL-node seed)") {
    import spark.implicits._
    // agg(min) over an empty frame yields one all-NULL row; the isNotNull
    // guard (mirrored in both oracles) must drop it, not publish a
    // phantom node at distance 0
    val eEmpty = Seq.empty[(Long, Long)].toDF("pa", "pb")
    assert(Graph.bfsCensus(eEmpty).collect().isEmpty, "empty graph -> empty histogram")
    val wEmpty = Seq.empty[(Long, Long, Long)].toDF("pa", "pb", "w")
    assert(Graph.ssspFrom(wEmpty).collect().isEmpty, "empty graph -> empty distance table")
  }

  test("lpa census: a triangle collapses to one community with the deterministic smallest-label tie-break") {
    import spark.implicits._
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb")
    val rows = Graph
      .lpaCensus(g, rounds = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // round 1: node 1 ties {2,3} -> 2; nodes 2,3 adopt 1 -> two labels,
    // largest community size 2. round 2: all three resolve to label 1.
    assert(rows === Seq((0L, 3L, 1L), (1L, 2L, 2L), (2L, 1L, 3L)), rows.mkString(","))
  }

  test("ppr: the query entity holds the top rank (it owns the only teleport), scores positive and descending") {
    val seedKey = graft.Tables
      .supplier(spark, TestSpark.sfDir)
      .agg(org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("s_suppkey")))
      .collect().head.getLong(0)
    val rows = SparkEntry
      .queries("q_graph_ppr")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.nonEmpty && rows.forall(_._2 > 0.0))
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
    assert(rows.head._1 === s"s$seedKey",
      s"the personalized seed must outrank every flow-only node: ${rows.head}")
  }

  test("sssp: a strong 2-hop path beats a weak direct edge, and a too-small round bound throws") {
    import spark.implicits._
    // lengths are 1000 div w: 1-2 and 2-3 at w=100 (len 10) beat the
    // direct 1-3 edge at w=2 (len 500) — dist(3) = 20, not 500
    val g = Seq((1L, 2L, 100L), (2L, 3L, 100L), (1L, 3L, 2L)).toDF("pa", "pb", "w")
    val d = Graph.ssspFrom(g).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d === Map(1L -> 0L, 2L -> 10L, 3L -> 20L), d.toString)
    // the 2-hop improvement lands in round 2 and confirms in round 3
    val ex = intercept[IllegalArgumentException](Graph.ssspFrom(g, maxRounds = 2).collect())
    assert(ex.getMessage.contains("did not converge"), ex.getMessage)
  }

  test("truss census: K4 plus a dangling triangle — the triangle peels at k=4, K4 survives") {
    import spark.implicits._
    // K4 on {1,2,3,4}: every edge sits in 2 triangles (support 2).
    // Dangling triangle {4,5,6}: each of its edges has support 1.
    val g = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)
    ).toDF("pa", "pb")
    val rows = Graph
      .trussCensus(g, 4)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .toMap
    // round 0: all 9 edges; round 1: the triangle's 3 support-1 edges
    // drop; round 2 confirms the 6-edge K4 fixpoint; -1 = converged truss
    assert(rows === Map(0L -> 9L, 1L -> 6L, 2L -> 6L, 3L -> 6L, 4L -> 6L, -1L -> 6L),
      rows.toString)
    // at k=3 every edge sits in >= 1 triangle: nothing peels
    val t3 = Graph.trussCensus(g, 3).collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(t3(-1L) === 9L, t3.toString)
  }

  test("weighted pagerank: a heavy tie concentrates mass, symmetric endpoints score identically") {
    import spark.implicits._
    // triangle with one heavy edge: nodes 1,2 trade 100/102 of their flow
    // with each other and starve node 3; the graph is symmetric under
    // 1 <-> 2, so the integer fixed point gives s1 == s2 exactly
    val g = Seq((1L, 2L, 100L), (1L, 3L, 2L), (2L, 3L, 2L)).toDF("pa", "pb", "w")
    val s = Graph.buildWeightedPagerankScores(g).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s(1L) === s(2L), s.toString)
    assert(s(1L) > s(3L), s.toString)
    // total mass stays ~1e12 (floor division only ever drops picounits)
    val total = s.values.sum
    assert(total <= 1000000000000L && total > 990000000000L, total.toString)
  }

  test("clustering census: planted triangles land in exact integer deciles with pooled moments") {
    import spark.implicits._
    // triangle {1,2,3} + node 4 closing {1,2,4} + pendant 5 on 3:
    //   nodes 1,2: d=3, t=2 -> c=2/3 -> decile 40 div 6 = 6
    //   node  3:   d=3, t=1 -> c=1/3 -> decile 20 div 6 = 3
    //   node  4:   d=2, t=1 -> c=1   -> decile 10
    //   node  5:   d=1 -> excluded
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 5L)).toDF("pa", "pb")
    val rows = Graph
      .clusteringCensus(g)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(rows === Seq((3L, 1L, 2.0 / 6.0), (6L, 2L, 8.0 / 12.0), (10L, 1L, 1.0)),
      rows.mkString(","))
  }

  test("assortativity: a star is exactly -1, a regular graph is NULL, the fixture lands in [-1, 1]") {
    import spark.implicits._
    val star = (1L to 5L).map(i => (0L, i)).toDF("pa", "pb")
    val rStar = Graph.assortativityFrom(star).collect().head
    assert(rStar.getLong(0) === 5L)
    assert(rStar.getDouble(1) === -1.0, s"hub-and-spoke is perfectly disassortative: $rStar")
    // triangle: every degree equal -> zero variance -> NULL, not a crash
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb")
    assert(Graph.assortativityFrom(tri).collect().head.isNullAt(1))
    val fx = SparkEntry.queries("q_graph_assortativity")(spark, TestSpark.sfDir).collect().head
    assert(!fx.isNullAt(1) && math.abs(fx.getDouble(1)) <= 1.0, fx.toString)
  }

  test("degree census: both kinds count the same edge set, degrees bound each other") {
    val rows = SparkEntry
      .queries("q_graph_degrees")(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq("customer", "supplier"))
    val Seq(cust, supp) = rows.toSeq
    assert(cust._3 === supp._3, "edge endpoints counted from either side must agree")
    assert(cust._2 * cust._5 >= cust._3, "n_nodes * max_deg bounds the edge count")
    assert(supp._5 <= cust._2, "a supplier's degree is at most the number of customers")
  }

  test("modularity: two planted 3-cliques with a bridge score the hand-computed exact rational") {
    import spark.implicits._
    // cliques {1,2,3} and {4,5,6} bridged by 3-4: m = 7, LPA settles on
    // communities {1,2,3}->1 and {4,5,6}->3 by round 4; intra = 6,
    // degrees (2,2,3,3,2,2) give D_c = 7 per community, so
    // Q = (4*7*6 - 2*49) / (4*49) = 70/196. Seeds 1->10 / 4->20 spread to
    // the same partition (node 3's {10,20} tie resolves to 10), so the
    // seeded row carries the identical rational.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("pa", "pb")
    val seeds = Seq((1L, 10L), (4L, 20L)).toDF("node", "lbl")
    val rows = Graph
      .modularityTracked(g, seeds)._1
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(rows === Seq(
      ("lpa", 2L, 7L, 6L, 70.0 / 196.0),
      ("seeded", 2L, 7L, 6L, 70.0 / 196.0)
    ), rows.mkString(","))
  }

  test("conductance: the planted two-clique bridge scores 1/7 per community, singletons score 1") {
    import spark.implicits._
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("pa", "pb")
    val seeds = Seq((1L, 10L), (4L, 20L)).toDF("node", "lbl")
    val (cs, _) = Graph.communityStructureTracked(g, seeds)
    val rows = Graph
      .conductanceFromStructure(cs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))
      .toSeq
    // each clique+bridge community: vol = 7, cut = 1 (the bridge),
    // phi = 1 / min(7, 14-7) = 1/7 — for the LPA labels {1, 3} and the
    // seeded labels {10, 20} alike
    val phi = 1.0 / 7.0
    assert(rows === Seq(
      ("lpa", 1L, 3L, 7L, 1L, phi),
      ("lpa", 3L, 3L, 7L, 1L, phi),
      ("seeded", 10L, 3L, 7L, 1L, phi),
      ("seeded", 20L, 3L, 7L, 1L, phi)
    ), rows.mkString(","))
    // empty seeds -> singleton completion: every singleton's boundary IS
    // its whole volume, so phi = d/min(d, 2m-d) = 1 exactly
    val (csSingle, _) = Graph.communityStructureTracked(
      g, Seq.empty[(Long, Long)].toDF("node", "lbl"))
    val singles = Graph.conductanceFromStructure(csSingle)
      .filter(org.apache.spark.sql.functions.col("partition") === "seeded")
      .collect()
      .map(r => r.getDouble(5))
    assert(singles.length === 6 && singles.forall(_ === 1.0), "singletons must score exactly 1")
    // a whole-graph community has no boundary: phi is NULL, not 0
    val (csTri, _) = Graph.communityStructureTracked(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("pa", "pb"),
      Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("node", "lbl"))
    val whole = Graph.conductanceFromStructure(csTri)
      .filter(org.apache.spark.sql.functions.col("partition") === "seeded")
      .collect()
    assert(whole.length === 1 && whole(0).isNullAt(5), "whole-graph community must be NULL")
  }

  test("modularity: an empty seed set completes to singletons — zero intra mass, pure degree penalty") {
    import spark.implicits._
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("pa", "pb")
    val seeds = Seq.empty[(Long, Long)].toDF("node", "lbl")
    val seeded = Graph
      .modularityTracked(g, seeds)._1
      .filter(org.apache.spark.sql.functions.col("partition") === "seeded")
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4)))
      .toSeq
    // every node its own community: 6 singletons, intra = 0,
    // sum(d^2) = 4+4+9+9+4+4 = 34, Q = -34/196
    assert(seeded === Seq((6L, 0L, -34.0 / 196.0)), seeded.mkString(","))
  }
}
