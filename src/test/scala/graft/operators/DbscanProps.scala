package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential property for the LSH-blocked DBSCAN census on RANDOM
  * neighbor graphs: the distributed pipeline (degree census +
  * pointer-doubling CC over cores + min-cluster border assignment) must
  * match a brute-force in-memory DBSCAN on every census row, including
  * the noise row — random shapes catch class-boundary cases the planted
  * [[DbscanSpec]] structures don't (bridges, chains of borders,
  * multi-core ties).
  */
object DbscanProps extends Properties("DbscanOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  private val cases: Gen[(List[(Long, Long)], Int, Int)] =
    for {
      n      <- Gen.chooseNum(3, 10)
      ids     = (1L to n.toLong).toList
      pairs  <- Gen.listOfN(n * 2, Gen.zip(Gen.oneOf(ids), Gen.oneOf(ids)))
      minPts <- Gen.chooseNum(1, 4)
    } yield (
      pairs.collect { case (a, b) if a != b => (a min b, a max b) }.distinct,
      n,
      minPts
    )

  /** Brute-force DBSCAN census: (cluster -> (n_core, n_border, n_total))
    * plus the -1 noise row, the spec's exact semantics.
    */
  private def reference(
      pairs: List[(Long, Long)],
      universe: Seq[Long],
      minPts: Int
  ): Map[Long, (Long, Long, Long)] = {
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val core = universe.filter(v => nbrs.getOrElse(v, Set.empty).size >= minPts).toSet
    // CC over the core-core subgraph, min-id labels
    var label = core.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      core.foreach { v =>
        val m = (nbrs(v).intersect(core).map(label) + label(v)).min
        if (m < label(v)) { label += v -> m; changed = true }
      }
    }
    val borders = universe
      .filterNot(core)
      .flatMap { v =>
        val coreNbrs = nbrs.getOrElse(v, Set.empty).intersect(core)
        if (coreNbrs.isEmpty) None else Some(v -> coreNbrs.map(label).min)
      }
      .toMap
    val census = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    core.foreach { v =>
      val c = census.getOrElse(label(v), (0L, 0L)); census(label(v)) = (c._1 + 1, c._2)
    }
    borders.values.foreach { cl =>
      val c = census.getOrElse(cl, (0L, 0L)); census(cl) = (c._1, c._2 + 1)
    }
    val noise = universe.size.toLong - core.size - borders.size
    census.map { case (cl, (nc, nb)) => cl -> ((nc, nb, nc + nb)) }.toMap +
      (-1L -> ((0L, 0L, noise)))
  }

  property("distributed census == brute-force DBSCAN (classes, clusters, ties, noise)") =
    Prop.forAll(cases) { case (pairs, n, minPts) =>
      import spark.implicits._
      val universe = (1L to n.toLong).toSeq
      val got = Similarity
        .dbscanFromPairs(
          pairs.toDF("vec_a", "vec_b"),
          universe.toDF("vec_id"),
          minPts)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val want = reference(pairs, universe, minPts)
      Prop(got == want) :| s"pairs=$pairs minPts=$minPts got=$got want=$want"
    }
}
