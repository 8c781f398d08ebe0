package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based layer (SURVEY §5.2): ∀ in-range ids, the codec round-trips
  * and preserves ordering; encode is injective within range.
  */
object OffsetCodecProps extends Properties("OffsetCodec") {

  private val ledgers = Gen.chooseNum(0L, (1L << 35) - 1)
  private val entries = Gen.chooseNum(0L, OffsetCodec.EntryMask)

  property("decode(encode(l, e)) == (l, e)") = Prop.forAll(ledgers, entries) { (l, e) =>
    OffsetCodec.decode(OffsetCodec.encode(l, e)) == ((l, e))
  }

  property("encode is monotone in entry within a ledger") =
    Prop.forAll(ledgers, Gen.chooseNum(0L, OffsetCodec.EntryMask - 1)) { (l, e) =>
      OffsetCodec.encode(l, e) < OffsetCodec.encode(l, e + 1)
    }

  property("encode is monotone across ledgers") =
    Prop.forAll(Gen.chooseNum(0L, (1L << 34) - 1), entries, entries) { (l, e1, e2) =>
      OffsetCodec.encode(l, e1) < OffsetCodec.encode(l + 1, e2)
    }

  property("next is the successor long (offset density is NOT implied)") =
    Prop.forAll(ledgers, entries) { (l, e) =>
      OffsetCodec.next(OffsetCodec.encode(l, e)) == OffsetCodec.encode(l, e) + 1
    }

  property("ledger/entry extraction consistent with decode") =
    Prop.forAll(ledgers, entries) { (l, e) =>
      val o = OffsetCodec.encode(l, e)
      OffsetCodec.ledgerId(o) == l && OffsetCodec.entryId(o) == e
    }
}
