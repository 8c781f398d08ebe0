package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the map-only entropy expression against an independent
  * naive reference (plain double sums over a codepoint histogram — NOT the
  * decimal-cast arithmetic the expression replicates, so agreement is
  * mathematical, not implementation-shared). Driver-side only: `entropyOf`
  * needs no Spark session.
  */
object CharEntropyProps extends Properties("CharEntropy") {

  private val e = CharEntropy(Literal.create("", StringType))
  private def h(s: String): Double = e.entropyOf(UTF8String.fromString(s))

  // mixed ASCII / Greek / astral (surrogate-pair) code points
  private val cp = Gen.frequency(
    (6, Gen.choose(32, 126)),
    (2, Gen.choose(0x3b1, 0x3c9)),
    (1, Gen.const(0x1f600))
  )
  private val strs = Gen.listOf(cp).map(cps => new String(cps.toArray, 0, cps.length))

  private def ref(s: String): Double = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) 0.0
    else {
      val n = cps.length.toDouble
      val counts = cps.groupBy(identity).values.map(_.length.toDouble)
      math.log(n) - counts.map(c => c * math.log(c)).sum / n
    }
  }

  property("agrees with the naive double-sum reference within 1e-9") =
    Prop.forAll(strs) { s => math.abs(h(s) - ref(s)) < 1e-9 }

  property("bounded by [0, ln(distinct codepoints)] up to rounding") =
    Prop.forAll(strs) { s =>
      val d = math.max(1, s.codePoints().distinct().count())
      h(s) >= -1e-9 && h(s) <= math.log(d.toDouble) + 1e-9
    }

  property("histogram-based: reversal and sorting do not change it") =
    Prop.forAll(strs) { s =>
      // decimal term sums are exact, so invariance is EXACT, not approximate
      java.lang.Double.compare(h(s), h(s.reverse)) == 0 &&
      java.lang.Double.compare(h(s), h(new String(s.codePoints().sorted().toArray, 0, s.codePoints().count().toInt))) == 0
    }

  property("self-concatenation preserves entropy (counts scale uniformly)") =
    Prop.forAll(strs) { s => math.abs(h(s + s) - h(s)) < 1e-9 }
}
