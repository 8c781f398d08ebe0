package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the readCompacted reader-side compaction: for ANY message
  * sequence (strictly increasing offsets; keys optional), the compacted
  * slice must equal Pulsar's compacted-read contract — one survivor per
  * key (the key's highest offset), every unkeyed message retained, and
  * retained messages in offset order.
  */
object CompactByKeyProps extends Properties("compactByKey") {

  // a log slice: strictly increasing offsets, each payload = optional key
  private val slices: Gen[List[(Long, Option[String])]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1L << 40), Gen.option(Gen.oneOf("a", "b", "c", "d", "e"))))
      .map(_.distinctBy(_._1).sortBy(_._1))

  // the shape the two-pass design exists for: almost every row unkeyed
  // (a single-pass implementation buffers all of these)
  private val unkeyedHeavy: Gen[List[(Long, Option[String])]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 1L << 40),
      Gen.frequency(9 -> Gen.const(Option.empty[String]), 1 -> Gen.some(Gen.oneOf("a", "b")))
    )).map(_.distinctBy(_._1).sortBy(_._1))

  private def compact(rows: List[(Long, Option[String])]): List[(Long, Option[String])] =
    EventLogReaderFactory
      .compactByKey[Option[String]](() => rows.iterator, identity)
      .toList

  property("one survivor per key, holding the key's highest offset") = Prop.forAll(slices) { rows =>
    val out   = compact(rows)
    val byKey = out.collect { case (o, Some(k)) => k -> o }
    byKey.map(_._1).distinct.length == byKey.length &&
    byKey.forall { case (k, o) =>
      o == rows.collect { case (ro, Some(rk)) if rk == k => ro }.max
    }
  }

  property("every unkeyed message is retained verbatim") = Prop.forAll(slices) { rows =>
    compact(rows).filter(_._2.isEmpty) == rows.filter(_._2.isEmpty)
  }

  property("retained messages keep offset order and are a subset of the input") =
    Prop.forAll(slices) { rows =>
      val out = compact(rows)
      out.map(_._1) == out.map(_._1).sorted && out.toSet.subsetOf(rows.toSet)
    }

  property("compacting a compacted slice is a no-op (idempotence)") = Prop.forAll(slices) { rows =>
    val once = compact(rows)
    compact(once) == once
  }

  property("key set is preserved: no key vanishes, none appears") = Prop.forAll(slices) { rows =>
    compact(rows).flatMap(_._2).toSet == rows.flatMap(_._2).toSet
  }

  property("unkeyed-heavy slices: full contract holds, retained rows stream in offset order") =
    Prop.forAll(unkeyedHeavy) { rows =>
      val out = compact(rows)
      out.filter(_._2.isEmpty) == rows.filter(_._2.isEmpty) &&
      out.map(_._1) == out.map(_._1).sorted &&
      out.collect { case (o, Some(k)) => k -> o }.forall { case (k, o) =>
        o == rows.collect { case (ro, Some(rk)) if rk == k => ro }.max
      }
    }

  property("a key first seen in pass 2 (live append between passes) is retained, never a crash") =
    Prop.forAll(slices) { rows =>
      // pass 2's thunk sees an extra late row with a brand-new key — the
      // concurrent-append race on a live log. It must come through as its
      // own latest survivor.
      val late   = (rows.map(_._1).maxOption.getOrElse(0L) + 1, Some("zz-new"))
      var pass   = 0
      val out = EventLogReaderFactory
        .compactByKey[Option[String]](
          () => { pass += 1; if (pass == 1) rows.iterator else (rows :+ late).iterator },
          identity
        )
        .toList
      out.contains(late) && out.filterNot(_ == late) == compact(rows)
    }

  property("the pass-one seam reports the slice row count and distinct key count") =
    Prop.forAll(slices) { rows =>
      var seenRows  = -1L
      var seenKeyed = -1L
      EventLogReaderFactory
        .compactByKey[Option[String]](() => rows.iterator, identity, (n, k) => { seenRows = n; seenKeyed = k })
        .toList
      seenRows == rows.length.toLong &&
      seenKeyed == rows.flatMap(_._2).distinct.length.toLong
    }
}
