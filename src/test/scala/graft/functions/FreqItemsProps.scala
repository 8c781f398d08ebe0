package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import scala.jdk.CollectionConverters._

/** Property pins for the Misra-Gries state against the textbook guarantee:
  *   true - deficit <= est <= true   and   deficit <= n / (k + 1)
  * for any stream, any split of the stream into merged sub-sketches, and
  * any k — with the HEAVY-HITTER corollary (every item above n/(k+1) is
  * present) asserted directly, since that is what q_text_heavyhitters'
  * candidate pruning relies on. Items from a small alphabet so collisions,
  * decrements and merge-trims are all likely. Driver-side only.
  */
object FreqItemsProps extends Properties("MgState") {

  private val ks    = Gen.choose(1, 16)
  private val item  = Gen.choose('a', 'j').map(_.toString)
  private val seqs  = Gen.listOf(item)

  private def sketch(vals: Seq[String], k: Int): MgState = {
    val st = new MgState(k)
    vals.foreach(st.update)
    st
  }

  private def exact(vals: Seq[String]): Map[String, Long] =
    vals.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def bounds(st: MgState, vals: Seq[String], k: Int): Prop = {
    val truth = exact(vals)
    val ests  = st.counts.asScala.toMap
    val n     = vals.size.toLong
    Prop.all(
      Prop(st.deficit <= n / (k + 1)) :| s"deficit ${st.deficit} > n/(k+1) ${n / (k + 1)}",
      Prop(ests.forall { case (i, e) => e <= truth.getOrElse(i, 0L) }) :| "an estimate overcounts",
      Prop(ests.forall { case (i, e) => e >= truth.getOrElse(i, 0L) - st.deficit }) :| "undercount beyond deficit",
      Prop(truth.forall { case (i, c) => c <= n / (k + 1) || ests.contains(i) }) :| "a heavy hitter is missing"
    )
  }

  property("single-stream MG bound + heavy-hitter guarantee") =
    Prop.forAll(ks, seqs) { (k, xs) => bounds(sketch(xs, k), xs, k) }

  property("merged sub-sketches keep the bound (mergeable summaries)") =
    Prop.forAll(ks, seqs, seqs, seqs) { (k, a, b, c) =>
      val merged = sketch(a, k).mergeWith(sketch(b, k)).mergeWith(sketch(c, k))
      bounds(merged, a ++ b ++ c, k)
    }

  property("merge result holds at most k items") =
    Prop.forAll(ks, seqs, seqs) { (k, a, b) =>
      sketch(a, k).mergeWith(sketch(b, k)).counts.size <= k
    }

  property("vocabulary within k: sketch is exact with zero deficit") =
    Prop.forAll(seqs) { xs =>
      val st = sketch(xs, 10) // alphabet is 10 items ('a'..'j')
      st.deficit == 0L && st.counts.asScala.toMap == exact(xs)
    }

  property("aggregate serialize/deserialize round-trips counts and deficit") =
    Prop.forAll(ks, seqs) { (k, xs) =>
      val agg = FreqItemsAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), k)
      val st  = sketch(xs, k)
      val rt  = agg.deserialize(agg.serialize(st))
      rt.deficit == st.deficit && rt.counts.asScala.toMap == st.counts.asScala.toMap
    }
}
