package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the primitive KMV buffer (binary-search insert +
  * two-pointer merge): every operation must agree with the obvious
  * Set-based reference `distinct.sorted.take(k)`. Driver-side only — no
  * Spark jobs — so scalacheck's full case count is cheap. Duplicates are
  * deliberately likely (values drawn from a 51-point grid): the DISTINCT
  * semantics and the insert's found-by-binary-search path need them.
  */
object KmvSketchProps extends Properties("KmvState") {

  private val ks   = Gen.choose(2, 32)
  private val hash = Gen.choose(0, 50).map(_ / 50.0)
  private val seqs = Gen.listOf(hash)

  private def state(vals: Seq[Double], k: Int): KmvState = {
    val st = new KmvState(new Array[Double](k), 0)
    vals.foreach(st.insert)
    st
  }

  private def reference(vals: Seq[Double], k: Int): Seq[Double] =
    vals.distinct.sorted.take(k)

  property("insert sequence == k smallest distinct, ascending") =
    Prop.forAll(ks, seqs) { (k, xs) =>
      state(xs, k).toSeq == reference(xs, k)
    }

  property("merge == sketch of the concatenation (mergeability)") =
    Prop.forAll(ks, seqs, seqs) { (k, a, b) =>
      state(a, k).mergeWith(state(b, k)).toSeq == reference(a ++ b, k)
    }

  property("merge is commutative") =
    Prop.forAll(ks, seqs, seqs) { (k, a, b) =>
      state(a, k).mergeWith(state(b, k)).toSeq == state(b, k).mergeWith(state(a, k)).toSeq
    }

  property("re-inserting any already-present value is a no-op") =
    Prop.forAll(ks, seqs) { (k, xs) =>
      xs.isEmpty || {
        val st     = state(xs, k)
        val before = st.toSeq
        before.foreach(st.insert)
        st.toSeq == before
      }
    }

  property("aggregate serialize/deserialize round-trips the buffer") =
    Prop.forAll(ks, seqs) { (k, xs) =>
      val agg = KmvHashes(org.apache.spark.sql.catalyst.expressions.Literal(0.0), k)
      agg.deserialize(agg.serialize(state(xs, k))).toSeq == reference(xs, k)
    }

  property("driver-side intersection estimate is exact below k (sketches are the full sets)") =
    Prop.forAll(Gen.choose(0, 40), Gen.choose(0, 40), Gen.choose(0, 40)) { (nA, nShared, nB) =>
      // A = [0, nA) ∪ shared, B = [100, 100+nB) ∪ shared, k > |A ∪ B|
      val shared = (200 until 200 + nShared).map(_ / 1000.0)
      val a      = (0 until nA).map(_ / 1000.0) ++ shared
      val b      = (100 until 100 + nB).map(_ / 1000.0) ++ shared
      val k      = 256
      val (jac, inter) = KmvSketch.intersectionEstimate(
        state(a, k).toSeq,
        state(b, k).toSeq,
        k
      )
      val union = (a ++ b).distinct.size
      (union == 0 && jac == 0.0 && inter == 0.0) ||
      (math.abs(jac - nShared.toDouble / union) < 1e-12 &&
        math.abs(inter - nShared.toDouble) < 1e-9)
    }

  property("driver-side A-NOT-B estimate is exact below k, and A\\B + B\\A + A∩B == A∪B") =
    Prop.forAll(Gen.choose(0, 40), Gen.choose(0, 40), Gen.choose(0, 40)) { (nA, nShared, nB) =>
      val shared = (200 until 200 + nShared).map(_ / 1000.0)
      val a      = (0 until nA).map(_ / 1000.0) ++ shared
      val b      = (100 until 100 + nB).map(_ / 1000.0) ++ shared
      val k      = 256
      val sa     = state(a, k).toSeq
      val sb     = state(b, k).toSeq
      val (_, aNotB)    = KmvSketch.aNotBEstimate(sa, sb, k)
      val (_, bNotA)    = KmvSketch.aNotBEstimate(sb, sa, k)
      val (_, inter)    = KmvSketch.intersectionEstimate(sa, sb, k)
      val union = (a ++ b).distinct.size
      (union == 0 && aNotB == 0.0 && bNotA == 0.0) ||
      (math.abs(aNotB - nA.toDouble) < 1e-9 &&
        math.abs(bNotA - nB.toDouble) < 1e-9 &&
        math.abs((aNotB + bNotA + inter) - union.toDouble) < 1e-9)
    }
}
