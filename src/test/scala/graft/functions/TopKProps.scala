package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the TopK typed-aggregate buffer against the obvious
  * reference `sorted((-score, key)).take(k)` — the merge path is what the
  * streaming state store and map-side partial aggregation both rely on.
  * Driver-side only; duplicates and tie scores are deliberately likely.
  */
object TopKProps extends Properties("TopK") {

  private val ks    = Gen.choose(1, 8)
  private val item  = for { s <- Gen.choose(0, 20); key <- Gen.choose(0L, 30L) } yield Scored(s / 4.0, key)
  private val items = Gen.listOf(item)

  private def ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.key))

  private def reduceAll(xs: Seq[Scored], k: Int): Seq[Scored] = {
    val agg = new TopK(k)
    xs.foldLeft(agg.zero)(agg.reduce).items
  }

  private def reference(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sorted(ord).take(k)

  property("reduce sequence == top-k by (score desc, key asc)") =
    Prop.forAll(ks, items) { (k, xs) => reduceAll(xs, k) == reference(xs, k) }

  property("merge == top-k of the concatenation (mergeability)") =
    Prop.forAll(ks, items, items) { (k, a, b) =>
      val agg = new TopK(k)
      agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)
      ).items == reference(a ++ b, k)
    }

  property("merge is commutative") =
    Prop.forAll(ks, items, items) { (k, a, b) =>
      val agg = new TopK(k)
      val (ba, bb) = (a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      agg.merge(ba, bb).items == agg.merge(bb, ba).items
    }

  property("buffer never exceeds k") =
    Prop.forAll(ks, items) { (k, xs) => reduceAll(xs, k).size <= k }
}
