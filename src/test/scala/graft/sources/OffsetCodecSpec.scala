package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the offset-codec quirks of the reference (`MessageIdUtils.java:25-43`,
  * SURVEY §1.1.2) so nothing downstream ever assumes offset density.
  * Property-style via seeded sampling (deterministic).
  */
class OffsetCodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("round-trip for in-range (ledger, entry) pairs (1000 samples)") {
    (1 to 1000).foreach { _ =>
      val ledger = rnd.nextLong((1L << 35) - 1)
      val entry  = rnd.nextLong(OffsetCodec.EntryMask + 1)
      assert(OffsetCodec.decode(OffsetCodec.encode(ledger, entry)) === ((ledger, entry)))
    }
  }

  test("28-bit entry boundary") {
    val maxEntry = OffsetCodec.EntryMask
    assert(OffsetCodec.decode(OffsetCodec.encode(7, maxEntry)) === ((7L, maxEntry)))
    // next() past the last entry of a ledger addresses a nonexistent entry in
    // the NEXT ledger's space: offsets are not dense (ledger rollover)
    val next = OffsetCodec.next(OffsetCodec.encode(7, maxEntry))
    assert(OffsetCodec.ledgerId(next) === 8L)
    assert(OffsetCodec.entryId(next) === 0L)
  }

  test("entry id masked to 28 bits on encode (out-of-range entries collapse)") {
    // (EntryMask + 5) & mask == 4: an overflowing entry id cannot corrupt the
    // ledger bits (the reference relies on Pulsar keeping entryId < 2^28)
    assert(OffsetCodec.encode(1, OffsetCodec.EntryMask + 5) === OffsetCodec.encode(1, 4))
  }

  test("monotonicity within a ledger (1000 samples)") {
    (1 to 1000).foreach { _ =>
      val ledger = rnd.nextLong(1L << 30)
      val entry  = rnd.nextLong(OffsetCodec.EntryMask)
      assert(OffsetCodec.encode(ledger, entry) < OffsetCodec.encode(ledger, entry + 1))
    }
  }

  test("earliest sentinel") {
    assert(OffsetCodec.Earliest === -1L)
  }
}
