package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Brute-force differential for the SemDeDup group-survivor family:
  * random vector sets × random cluster assignments × random thresholds
  * against an in-memory union-find reference of the same blocked-pair
  * rule — [[IvfSimilarity.semanticCcStats]]'s census integers and
  * [[IvfSimilarity.semanticDropIds]]'s drop set must both match exactly
  * (the planted spec pins one shape; this pins the rule over arbitrary
  * shapes, including cross-cluster blindness and threshold boundaries).
  */
object SemDedupProps extends Properties("SemDedupOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  /** Engine-identical rounded cosine: exact double dot/norms over the
    * float components, then HALF_UP at 6 decimals (Spark's round()); a
    * zero-norm side yields None (the engine's cosine_sim yields null,
    * which never passes the >= threshold filter).
    */
  private def cos6(a: Array[Float], b: Array[Float]): Option[Double] = {
    val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    val na  = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb  = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na == 0.0 || nb == 0.0) None
    else Some(BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  private def find(parent: scala.collection.mutable.Map[Long, Long], x: Long): Long =
    if (parent(x) == x) x
    else { val r = find(parent, parent(x)); parent(x) = r; r }

  private val cases: Gen[(Int, Int, List[Float], List[Int], Double)] =
    for {
      n    <- Gen.chooseNum(2, 14)
      dims <- Gen.chooseNum(2, 4)
      // small ints: exact zeros, ties, and negative cosines all happen
      vecs <- Gen.listOfN(n * dims, Gen.chooseNum(-4, 4).map(_.toFloat))
      cids <- Gen.listOfN(n, Gen.chooseNum(0, 2))
      thr  <- Gen.oneOf(0.0, 0.3, 0.7, 0.95)
    } yield (n, dims, vecs, cids, thr)

  property("census + drop set match an in-memory union-find reference") =
    Prop.forAll(cases) { case (n, dims, flat, cids, thr) =>
      val rows =
        (0 until n).map(i => (i.toLong, flat.slice(i * dims, (i + 1) * dims).toArray, cids(i)))
      import spark.implicits._
      val emb = rows.toDF("vec_id", "embedding", "label").select("vec_id", "embedding")
      val a2  = rows.map(r => (r._1, r._3)).toDF("vec_id", "cid")

      // reference: union-find over same-cid pairs with rounded cos >= thr
      val parent = scala.collection.mutable.Map((0 until n).map(i => i.toLong -> i.toLong): _*)
      for {
        i <- 0 until n; j <- (i + 1) until n
        if cids(i) == cids(j)
        c <- cos6(rows(i)._2, rows(j)._2)
        if c >= thr
      } {
        val (ri, rj) = (find(parent, i.toLong), find(parent, j.toLong))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      val comps    = (0 until n).map(_.toLong).groupBy(find(parent, _))
      val dupComps = comps.filter(_._2.size >= 2)
      val refDropped: Set[Long] =
        dupComps.values.flatMap(ms => ms.filterNot(_ == ms.min)).toSet
      val refCensus = (0 to 2).map { cid =>
        val members = (0 until n).count(cids(_) == cid)
        val groups  = dupComps.filter { case (_, ms) => cids(ms.head.toInt) == cid }
        (cid, members.toLong, groups.size.toLong, groups.values.map(_.size - 1).sum.toLong)
      }.filter(_._2 > 0)

      val gotDropped = IvfSimilarity
        .semanticDropIds(emb, a2, thr)
        .collect()
        .map(_.getLong(0))
        .toSet
      val gotCensus = IvfSimilarity
        .semanticCcStats(emb, a2, thr)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val okDrop   = gotDropped == refDropped
      val okCensus = gotCensus == refCensus
      if (!okDrop) println(s"DROP MISMATCH thr=$thr cids=$cids: got $gotDropped ref $refDropped")
      if (!okCensus) println(s"CENSUS MISMATCH thr=$thr cids=$cids: got $gotCensus ref $refCensus")
      okDrop && okCensus
    }
}
