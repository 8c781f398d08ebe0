package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the Bloom build/probe pair, driver-side (no session):
  * the no-false-negative contract must hold for ARBITRARY unicode keys
  * (multi-byte UTF-8, astral pairs, empty string) at every legal sizing —
  * the bit-layout agreement between the word-array build and the
  * serialized byte probe is exactly the invariant a fixed example suite
  * can miss.
  */
object BloomFilterProps extends Properties("BloomFilter") {

  private val cp = Gen.frequency(
    (6, Gen.choose(32, 126)),       // ASCII
    (2, Gen.choose(0x3b1, 0x3c9)),  // Greek (2-byte UTF-8)
    (1, Gen.const(0x1f600))         // astral (4-byte UTF-8, surrogate pair)
  )
  private val key  = Gen.listOf(cp).map(cps => new String(cps.toArray, 0, cps.length))
  private val keys = Gen.listOfN(50, key)
  private val kGen = Gen.choose(1, BloomFilter.MaxHashes)
  private val bitsGen = Gen.choose(1, 64).map(_ * 64)

  private def build(ks: Seq[String], bits: Int, k: Int): Array[Byte] = {
    val words = new Array[Long](bits / 64)
    ks.foreach(s => BloomFilter.add(words, bits, k, UTF8String.fromString(s)))
    BloomFilter.toBytes(words, k)
  }

  property("no false negatives for arbitrary unicode keys, any sizing") =
    Prop.forAll(keys, bitsGen, kGen) { (ks, bits, k) =>
      val f = build(ks, bits, k)
      ks.forall(s => BloomFilter.mightContain(f, UTF8String.fromString(s)))
    }

  property("header round-trips numHashes for every legal k") =
    Prop.forAll(bitsGen, kGen) { (bits, k) =>
      BloomFilter.numHashesOf(build(Seq("x"), bits, k)) == k
    }

  property("byte-wise OR of same-sized filters == jointly built filter") =
    Prop.forAll(keys, keys, kGen) { (a, b, k) =>
      val bits = 4096
      val or   = build(a, bits, k).zip(build(b, bits, k)).map { case (x, y) => (x | y).toByte }
      or.sameElements(build(a ++ b, bits, k))
    }

  property("raw-word serde round-trips") =
    Prop.forAll(Gen.listOf(Gen.long)) { ws =>
      BloomFilter.fromRawBytes(BloomFilter.toRawBytes(ws.toArray)).toSeq == ws
    }

  property("suggest returns BloomAgg-acceptable sizes for any (keys, fpp)") =
    Prop.forAll(Gen.choose(1L, Long.MaxValue / 2), Gen.choose(1e-12, 0.99)) { (n, fpp) =>
      val (bits, k) = BloomFilter.suggest(n, fpp)
      bits >= 64 && bits % 64 == 0 && k >= 1 && k <= BloomFilter.MaxHashes
    }
}
