package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential properties for the graph family on RANDOM small graphs —
  * the planted specs in [[GraphSpec]] pin known shapes (stars, triangles,
  * tails); these throw arbitrary sparse graphs at the same operators and
  * compare against brute-force references. Each case runs real Spark jobs
  * (the capped/oriented distributed pipelines, not reimplementations), so
  * the case count is bounded to keep the suite fast.
  */
object GraphProps extends Properties("GraphOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  /** Random undirected graphs: 2-9 node ids, duplicate/self pairs dropped,
    * normalized to pa < pb.
    */
  private val graphs: Gen[List[(Long, Long)]] =
    Gen
      .chooseNum(2, 9)
      .flatMap { n =>
        val ids = (1L to n.toLong).toList
        Gen
          .listOfN(n * 2, Gen.zip(Gen.oneOf(ids), Gen.oneOf(ids)))
          .map(_.collect { case (a, b) if a != b => (a min b, a max b) }.distinct)
      }
      .suchThat(_.nonEmpty)

  private def adjacency(es: List[(Long, Long)]): Map[Long, Set[Long]] =
    (es ++ es.map(e => (e._2, e._1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  property("degree-oriented triangle count == brute force") = Prop.forAll(graphs) { es =>
    import spark.implicits._
    // oriented-by-id common-neighbor count finds each triangle x<y<z once
    // (adj here maps a -> {b : (a,b) edge, a<b})
    val up  = es.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = es.map { case (a, b) => (up.getOrElse(a, Set.empty) & up.getOrElse(b, Set.empty)).size.toLong }.sum
    val got = Graph.triangleCount(es.toDF("pa", "pb")).collect().head.getLong(0)
    Prop(got == exp) :| s"triangles: got $got expected $exp on $es"
  }

  property("k-core converged core == brute-force peel (k=2)") = Prop.forAll(graphs) { es =>
    import spark.implicits._
    var adj = adjacency(es)
    var changed = true
    while (changed) {
      val doomed = adj.collect { case (n, nb) if nb.size < 2 => n }.toSet
      changed = doomed.nonEmpty
      adj = adj.collect {
        case (n, nb) if !doomed(n) => n -> (nb -- doomed)
      }
    }
    val expNodes = adj.size.toLong
    val expEdges = adj.values.map(_.size).sum.toLong / 2
    val row = Graph
      .kcoreCensus(es.toDF("pa", "pb"), 2, shownRounds = 0)
      .collect()
      .find(_.getLong(1) == -1L)
      .get
    Prop(row.getLong(2) == expNodes && row.getLong(3) == expEdges) :|
      s"kcore: got (${row.getLong(2)}, ${row.getLong(3)}) expected ($expNodes, $expEdges) on $es"
  }

  property("pointer-doubling CC == brute-force component count") = Prop.forAll(graphs) { es =>
    import spark.implicits._
    // brute components over nodes-with-edges
    val adj     = adjacency(es)
    var visited = Set.empty[Long]
    var comps   = 0
    adj.keys.foreach { n =>
      if (!visited(n)) {
        comps += 1
        var frontier = Set(n)
        while (frontier.nonEmpty) {
          visited ++= frontier
          frontier = frontier.flatMap(adj(_)) -- visited
        }
      }
    }
    val labels = Dedup.clusters(es.toDF("doc_a", "doc_b"))
    val got    = labels.select("label").distinct().count()
    Prop(got == comps.toLong) :| s"components: got $got expected $comps on $es"
  }

  property("random walks: every hop is an edge, one walk per node") = Prop.forAll(graphs) { es =>
    import spark.implicits._
    val adj = adjacency(es)
    val rows = Graph
      .walkFrame(es.toDF("pa", "pb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val countOk = rows.length == adj.size
    val hopsOk = rows.forall { case (s0, n1, n2, n3) =>
      adj(s0).contains(n1) && adj(n1).contains(n2) && adj(n2).contains(n3)
    }
    Prop(countOk && hopsOk) :| s"walks: $rows on $es"
  }

  property("multi-walk corpus (W=3, L=4): every hop is an edge, W rows per node") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj = adjacency(es)
      val rows = Graph
        .walkCorpus(es.toDF("pa", "pb"), hops = 4, walks = 3)
        .collect()
      val countOk = rows.length == adj.size * 3
      val keysOk  = rows.map(r => (r.getLong(0), r.getInt(1))).distinct.length == rows.length
      val hopsOk = rows.forall { r =>
        val path = r.getLong(0) +: (1 to 4).map(t => r.getLong(t + 1))
        path.sliding(2).forall { case Seq(a, b) => adj(a).contains(b) }
      }
      Prop(countOk && keysOk && hopsOk) :| s"multi-walks: ${rows.mkString(",")} on $es"
    }

  property("clustering decile census == brute-force per-node coefficients") = Prop.forAll(graphs) {
    es =>
      import spark.implicits._
      val adj = adjacency(es)
      val perNode = adj.toList.collect {
        case (v, nb) if nb.size >= 2 =>
          val t = nb.toList.combinations(2).count { case List(a, b) =>
            adj.getOrElse(a, Set.empty).contains(b)
          }
          (v, t.toLong, nb.size.toLong)
      }
      val expected = perNode
        .groupBy { case (_, t, d) => (20L * t) / (d * (d - 1)) }
        .map { case (dec, xs) =>
          val st  = xs.map(_._2 * 2).sum
          val sdd = xs.map { case (_, _, d) => d * (d - 1) }.sum
          (dec, xs.size.toLong, st.toDouble / sdd.toDouble)
        }
        .toList
        .sortBy(_._1)
      val got = Graph
        .clusteringCensus(es.toDF("pa", "pb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toList
      Prop(got == expected) :| s"got $got expected $expected on $es"
  }

  property("weighted pagerank: mass conserved within floor loss, matches brute-force integer loop") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val ew  = es.map { case (a, b) => (a, b, 1L + (a + b) % 5) }
      val adj = (ew ++ ew.map(e => (e._2, e._1, e._3)))
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
      val outw  = adj.view.mapValues(_.map(_._2).sum).toMap
      val nodes = adj.keySet.toList.sorted
      val n     = nodes.size.toLong
      // brute-force replica of the integer fixed point (5 rounds)
      var s = nodes.map(_ -> 1000000000000L / n).toMap
      for (_ <- 1 to 5) {
        val c = collection.mutable.Map(nodes.map(_ -> 0L): _*)
        for ((u, nbrs) <- adj; (v, w) <- nbrs)
          c(v) += (85L * s(u) * w) / (100L * outw(u))
        s = nodes.map(x => x -> (15000000000000L / (100L * n) + c(x))).toMap
      }
      val got = Graph
        .buildWeightedPagerankScores(ew.toDF("pa", "pb", "w"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toMap
      val total = got.values.sum
      Prop(got == s && total <= 1000000000000L && total > 900000000000L) :|
        s"got $got expected $s (total $total) on $ew"
    }

  property("bfs census == brute-force BFS from the min node (unreached as -1)") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj = adjacency(es)
      val src = adj.keys.min
      var dist    = Map(src -> 0L)
      var frontier = Set(src)
      var d       = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
        dist ++= frontier.map(_ -> d)
      }
      val unreached = adj.keySet.diff(dist.keySet).size.toLong
      val expected = (dist.values.groupBy(identity).map { case (k, v) => (k, v.size.toLong) } ++
        (if (unreached > 0) Map(-1L -> unreached) else Map.empty)).toList.sortBy(_._1)
      val got = Graph
        .bfsCensus(es.toDF("pa", "pb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toList
      Prop(got == expected) :| s"got $got expected $expected on $es"
    }

  property("harmonic centrality == brute-force multi-source BFS from the 4 min-id seeds") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj   = adjacency(es)
      val seeds = adj.keySet.toList.sorted.take(4)
      def bd(x: Double) = BigDecimal(x.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val expected = seeds.map { s =>
        var dist     = Map(s -> 0L)
        var frontier = Set(s)
        var d        = 0L
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
          dist ++= frontier.map(_ -> d)
        }
        val reach = dist.filter(_._2 > 0)
        (s, reach.size.toLong, reach.values.map(dd => bd(1.0 / dd)).sum.toDouble)
      }
      val got = Graph
        .harmonicCensus(es.toDF("pa", "pb"), seedCount = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toList
        .sortBy(_._1)
      Prop(got == expected) :| s"got $got expected $expected on $es"
    }

  property("effective diameter == brute-force histogram + integer 90% rule from the 4 min seeds") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj   = adjacency(es)
      val seeds = adj.keySet.toList.sorted.take(4)
      val dists = seeds.flatMap { s =>
        var dist     = Map(s -> 0L)
        var frontier = Set(s)
        var d        = 0L
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
          dist ++= frontier.map(_ -> d)
        }
        dist.values.filter(_ > 0)
      }
      val hist  = dists.groupBy(identity).map { case (d, xs) => (d, xs.size.toLong) }
      val total = hist.values.sum
      val eff = hist.keys.toList.sorted
        .find(d => 10 * hist.toList.filter(_._1 <= d).map(_._2).sum >= 9 * total)
        .get
      val expected = (hist.toList :+ ((-1L, eff))).sortBy(_._1)
      val got = Graph
        .effDiameterCensus(es.toDF("pa", "pb"), seedCount = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toList
        .sortBy(_._1)
      Prop(got == expected) :| s"got $got expected $expected on $es"
    }

  property("seeded label spread == brute-force clamped propagation (4 rounds)") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj = adjacency(es)
      // deterministic pseudo-labels on ~half the nodes
      val seedMap = adj.keySet.filter(_ % 2 == 0).map(n => n -> (n % 3 + 1)).toMap
      var lab     = seedMap
      for (_ <- 1 to 4) {
        val next = adj.keys.flatMap { n =>
          if (seedMap.contains(n)) Some(n -> seedMap(n))
          else {
            val votes = adj(n).toList.flatMap(lab.get)
            if (votes.isEmpty) None
            else {
              val counts = votes.groupBy(identity).map { case (l, xs) => (l, xs.size) }
              Some(n -> counts.toList.maxBy { case (l, c) => (c, -l) }._1)
            }
          }
        }.toMap
        lab = next
      }
      val unl = adj.keySet.size - lab.size
      val expected = (lab.values.groupBy(identity).map { case (l, xs) => (l.toLong, xs.size.toLong) }.toList ++
        (if (unl > 0) List((-1L, unl.toLong)) else Nil)).sortBy(_._1)
      val got = Graph
        .seededLabelsCensusTracked(
          es.toDF("pa", "pb"),
          seedMap.toSeq.map { case (n, l) => (n, l.toLong) }.toDF("node", "lbl"))
        ._1
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toList
        .sortBy(_._1)
      Prop(got == expected) :| s"got $got expected $expected on $es (seeds $seedMap)"
    }

  property("shortest-path multiplicity census == brute-force layered sigma from the 4 min seeds") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj   = adjacency(es)
      val seeds = adj.keySet.toList.sorted.take(4)
      val expected = seeds.map { s =>
        var dist  = Map(s -> 0L)
        var sig   = Map(s -> 1L)
        var layer = Set(s)
        var d     = 0L
        while (layer.nonEmpty) {
          d += 1
          val next = layer.flatMap(adj(_)).diff(dist.keySet)
          val nsig = next.map(v => v -> layer.toList.filter(adj(v)).map(sig).sum).toMap
          dist ++= next.map(_ -> d)
          sig ++= nsig
          layer = next
        }
        val reach = dist.filter(_._2 > 0).keySet
        (s, reach.size.toLong, reach.count(v => sig(v) > 1).toLong,
          if (reach.isEmpty) 0L else reach.map(sig).max)
      }.filter(_._2 > 0)
      val got = Graph
        .pathCountsCensus(es.toDF("pa", "pb"), seedCount = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toList
        .sortBy(_._1)
      Prop(got == expected) :| s"got $got expected $expected on $es"
    }

  property("betweenness census == brute-force Brandes backward pass from the 4 min seeds") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj   = adjacency(es)
      val seeds = adj.keySet.toList.sorted.take(4)
      // the operator's exact arithmetic, mirrored: 1e-6-unit int64 deltas,
      // two floor divisions per term, per-node clamp, one final /1e6
      val perSeed: Seq[Map[Long, Long]] = seeds.map { s =>
        var dist  = Map(s -> 0L)
        var sig   = Map(s -> 1L)
        var layer = Set(s)
        var d     = 0L
        while (layer.nonEmpty) {
          d += 1
          val next = layer.flatMap(adj(_)).diff(dist.keySet)
          val nsig = next.map(v => v -> layer.toList.filter(adj(v)).map(sig).sum).toMap
          dist ++= next.map(_ -> d)
          sig ++= nsig
          layer = next
        }
        val maxd  = dist.values.max
        var delta = Map.empty[Long, Long].withDefaultValue(0L)
        ((maxd - 1) to 0L by -1L).foreach { l =>
          dist.filter(_._2 == l).keys.foreach { v =>
            val succ = adj(v).filter(w => dist.get(w).contains(l + 1))
            val total = succ.toList.map { w =>
              BigInt(sig(v) * 1000000L / sig(w)) * (1000000L + delta(w)) / 1000000L
            }.sum
            delta += v -> (total min BigInt(Graph.DeltaCapUnits)).toLong
          }
        }
        dist.filter(_._2 > 0).keys.map(v => v -> delta(v)).toMap
      }
      val expected = perSeed
        .flatMap(_.toSeq)
        .groupBy(_._1)
        .map { case (n, xs) => (n, xs.size.toLong, xs.map(_._2).sum) }
        .toList
        .sortBy { case (n, _, u) => (-u, n) }
        .take(Graph.BetweennessTopK)
        .map { case (n, c, u) => (n, c, u.toDouble / 1000000.0) }
      val got = Graph
        .betweennessCensus(es.toDF("pa", "pb"), seedCount = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toList
      Prop(got == expected) :| s"got $got expected $expected on $es"
    }

  property("lpa census == brute-force synchronous label propagation (4 rounds)") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj = adjacency(es)
      var lab = adj.keySet.map(n => n -> n).toMap
      def censusOf(round: Long, l: Map[Long, Long]) = {
        val sizes = l.values.groupBy(identity).map(_._2.size.toLong)
        (round, sizes.size.toLong, sizes.max)
      }
      val expected = Seq.newBuilder[(Long, Long, Long)]
      expected += censusOf(0L, lab)
      for (k <- 1 to 4) {
        lab = lab.map { case (n, _) =>
          val counts = adj(n).toList.map(lab).groupBy(identity).map { case (l, xs) => (l, xs.size) }
          val best   = counts.toList.maxBy { case (l, c) => (c, -l) }
          n -> best._1
        }
        expected += censusOf(k.toLong, lab)
      }
      val got = Graph
        .lpaCensus(es.toDF("pa", "pb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toList
      Prop(got == expected.result().toList) :| s"got $got expected ${expected.result()} on $es"
    }

  property("k-truss converged truss == brute-force support peel (k=3)") = Prop.forAll(graphs) {
    es =>
      import spark.implicits._
      def adjOf(edges: Set[(Long, Long)]): Map[Long, Set[Long]] =
        (edges.toList ++ edges.toList.map(e => (e._2, e._1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var cur    = es.toSet
      var stable = false
      while (!stable) {
        val adj = adjOf(cur)
        val next = cur.filter { case (a, b) =>
          (adj(a) & adj(b)).nonEmpty // support >= k-2 = 1
        }
        stable = next == cur
        cur = next
      }
      val got = Graph
        .trussCensus(es.toDF("pa", "pb"), 3)
        .collect()
        .collectFirst { case r if r.getLong(1) == -1L => r.getLong(2) }
        .get
      Prop(got == cur.size.toLong) :| s"got $got expected ${cur.size} on $es"
  }

  property("sssp == brute-force Floyd-Warshall from the min node (hash-derived weights)") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      // deterministic per-edge weights in 2..5 -> integer lengths 1000 div w
      val ew    = es.map { case (a, b) => (a, b, 2L + (a * 31 + b) % 4) }
      val len   = ew.map { case (a, b, w) => ((a, b), 1000L / w) }.toMap
      val nodes = es.flatMap(e => List(e._1, e._2)).distinct
      val src   = nodes.min
      val inf   = Long.MaxValue / 4
      val d0 = collection.mutable.Map(nodes.map(n => n -> inf): _*)
      d0(src) = 0L
      for (_ <- nodes.indices; ((a, b), l) <- len) {
        if (d0(a) + l < d0(b)) d0(b) = d0(a) + l
        if (d0(b) + l < d0(a)) d0(a) = d0(b) + l
      }
      val expected = d0.filter(_._2 < inf).toMap
      val got = Graph
        .ssspFrom(ew.toDF("pa", "pb", "w"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toMap
      Prop(got == expected) :| s"got $got expected $expected on $ew"
    }

  property("assortativity rational form == direct double-precision Pearson over edge endpoints") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      // the textbook formulation: degree-degree Pearson with sqrt over the
      // symmetrized endpoint list — a sign/moment error in the collapsed
      // rational would survive fixtures but not random graphs
      val deg = adjacency(es).view.mapValues(_.size.toDouble).toMap
      val xy  = (es ++ es.map(e => (e._2, e._1))).map { case (u, v) => (deg(u), deg(v)) }
      val n   = xy.size.toDouble
      val sx  = xy.map(_._1).sum
      val sy  = xy.map(_._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val row = Graph.assortativityFrom(es.toDF("pa", "pb")).collect().head
      if (den == 0.0) Prop(row.isNullAt(1)) :| s"regular graph must be NULL: $row on $es"
      else {
        val exp = (n * sxy - sx * sy) / den
        Prop(math.abs(row.getDouble(1) - exp) < 1e-9) :|
          s"assortativity: got ${row.getDouble(1)} expected $exp on $es"
      }
    }

  property("adamic-adar (cap above any degree) == brute force over 2-hop non-edges") =
    Prop.forAll(graphs) { es =>
      import spark.implicits._
      val adj   = adjacency(es)
      val edges = es.toSet
      val exp = (for {
        a <- adj.keys
        c <- adj.keys
        if a < c && !edges((a, c))
        common = adj(a) & adj(c)
        if common.nonEmpty
      } yield {
        val aa = common.toSeq
          .map(b => BigDecimal(1.0 / math.log(adj(b).size.toDouble)).setScale(12, BigDecimal.RoundingMode.HALF_UP))
          .sum
          .toDouble
        (a, c) -> (common.size.toLong, aa)
      }).toMap
      val got = Graph
        .adamicAdarScores(es.toDF("pa", "pb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val keysMatch = got.keySet == exp.keySet
      val valsMatch = keysMatch && exp.forall { case (k, (n, aa)) =>
        got(k)._1 == n && math.abs(got(k)._2 - aa) < 1e-5
      }
      Prop(valsMatch) :| s"adamic-adar: got $got expected $exp on $es"
    }

  property("modularity rows == brute-force exact rational over the LPA and seeded partitions") =
    Prop.forAll(graphs) { es0 =>
      import spark.implicits._
      // re-apply the generator's invariants: shrinking bypasses the gen's
      // filter and can hand back a self-loop, which a (pa < pb) edge
      // frame never contains
      val es  = es0.collect { case (a, b) if a != b => (a min b, a max b) }.distinct
      val adj = adjacency(es)
      if (es.isEmpty) Prop.passed
      else {
      val m   = es.size.toLong
      val deg = adj.view.mapValues(_.size.toLong).toMap
      // synchronous unseeded LPA, 4 rounds, pure neighbor vote, ties to
      // the smallest label — the lpaCensusTracked rule
      var lpa = adj.keySet.map(n => n -> n).toMap
      for (_ <- 1 to 4) {
        lpa = adj.keys.map { n =>
          val counts = adj(n).toList.map(lpa).groupBy(identity).map { case (l, xs) => (l, xs.size) }
          n -> counts.toList.maxBy { case (l, c) => (c, -l) }._1
        }.toMap
      }
      // clamped seeded spread (the seeded-labels rule), seeds on even ids
      val seedMap = adj.keySet.filter(_ % 2 == 0).map(n => n -> (n % 3 + 1)).toMap
      var sl      = seedMap
      for (_ <- 1 to 4) {
        sl = adj.keys.flatMap { n =>
          if (seedMap.contains(n)) Some(n -> seedMap(n))
          else {
            val votes = adj(n).toList.flatMap(sl.get)
            if (votes.isEmpty) None
            else {
              val counts = votes.groupBy(identity).map { case (l, xs) => (l, xs.size) }
              Some(n -> counts.toList.maxBy { case (l, c) => (c, -l) }._1)
            }
          }
        }.toMap
      }
      val slFull = adj.keySet.map(n => n -> sl.getOrElse(n, -n - 1)).toMap
      def q(lab: Map[Long, Long]): (Long, Long, Double) = {
        val intra = es.count { case (a, b) => lab(a) == lab(b) }.toLong
        val dsq = lab.groupBy(_._2).values
          // .iterator: mapping a key SET through deg would collapse equal
          // degree values before the sum
          .map(c => { val d = c.keys.iterator.map(deg).sum; BigInt(d) * BigInt(d) })
          .sum
        val nc   = lab.values.toSet.size.toLong
        val qnum = BigInt(4) * BigInt(m) * BigInt(intra) - dsq
        val qden = BigInt(4) * BigInt(m) * BigInt(m)
        (nc, intra, qnum.toDouble / qden.toDouble)
      }
      val expLpa  = q(lpa.map { case (k, v) => (k, v.toLong) })
      val expSeed = q(slFull.map { case (k, v) => (k, v.toLong) })
      val seedsDf = seedMap.toSeq.map { case (n, l) => (n, l.toLong) }.toDF("node", "lbl")
      val got = Graph
        .modularityTracked(es.toDF("pa", "pb"), seedsDf)
        ._1
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(4))))
        .toMap
      // conductance from the SAME brute-force labels: per community,
      // phi = cut / min(vol, 2m - vol), NULL when the min is 0
      def phis(lab: Map[Long, Long]): Map[Long, Option[Double]] =
        lab.values.toSet.map { (c: Long) =>
          val members = lab.collect { case (n, l) if l == c => n }.toSet
          val vol     = members.iterator.map(deg).sum
          val cut     = es.count { case (a, b) => members(a) != members(b) }.toLong
          val den     = math.min(vol, 2 * m - vol)
          c -> (if (den == 0) None else Some(cut.toDouble / den.toDouble))
        }.toMap
      val expPhi = Map(
        "lpa"    -> phis(lpa.map { case (k, v) => (k, v.toLong) }),
        "seeded" -> phis(slFull.map { case (k, v) => (k, v.toLong) }))
      val (cs, _) = Graph.communityStructureTracked(es.toDF("pa", "pb"), seedsDf)
      val gotPhi = Graph
        .conductanceFromStructure(cs)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(5)) None else Some(r.getDouble(5))))
        .toMap
      val phiOk = expPhi.forall { case (pt, mm) =>
        mm.forall { case (c, v) => gotPhi.get((pt, c)).contains(v) }
      } && gotPhi.size == expPhi("lpa").size + expPhi("seeded").size
      Prop(got("lpa") == expLpa && got("seeded") == expSeed && phiOk) :|
        s"got $got phi $gotPhi expected lpa=$expLpa seeded=$expSeed phi=$expPhi on $es (seeds $seedMap)"
      }
    }
}
