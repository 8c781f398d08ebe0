package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Property pins for the count-min counter mechanics: the sketch laws
  * (one-sided error, exact mergeability, inner-product over-estimate)
  * must hold for EVERY input, not just the unit-test fixtures. All
  * driver-side — the bucket rule is re-derived locally (the same sliced
  * md5 the queries and the DuckDB oracles use), and keys are drawn from
  * a small alphabet so collisions and heavy duplication are likely.
  */
object CountMinSketchProps extends Properties("CountMinSketch") {

  private val Depth = 4
  private val Width = 16 // small on purpose: collisions must actually happen

  /** Driver-side twin of [[CountMinSketch.bucketsCol]]. */
  private def buckets(key: String): Array[Int] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (0 until Depth).map { d =>
      (java.lang.Long.parseLong(hex.substring(8 * d, 8 * d + 8), 16) % Width).toInt
    }.toArray
  }

  private def counters(keys: Seq[String]): Array[Long] = {
    val c = new Array[Long](Depth * Width)
    keys.foreach { k =>
      val b = buckets(k)
      (0 until Depth).foreach(d => c(d * Width + b(d)) += 1L)
    }
    c
  }

  private def sketch(keys: Seq[String]): Array[Byte] =
    CountMinSketch.toBytes(counters(keys), Depth, Width)

  private def estimate(sk: Array[Byte], key: String): Long =
    CountMinSketch.query(
      sk,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets(key))
    )

  private val key  = Gen.oneOf((0 until 40).map(i => s"k$i"))
  private val keys = Gen.listOf(key)

  property("point query >= truth for every key, present or absent") =
    Prop.forAll(keys, key) { (xs, probe) =>
      val truth = xs.count(_ == probe).toLong
      estimate(sketch(xs), probe) >= truth
    }

  property("merge == sketch of the concatenation, counter-exact") =
    Prop.forAll(keys, keys) { (a, b) =>
      val merged = counters(a).zip(counters(b)).map { case (x, y) => x + y }
      merged.toSeq == counters(a ++ b).toSeq
    }

  property("inner product >= true equi-join size") =
    Prop.forAll(keys, keys) { (a, b) =>
      val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val trueJoin = b.map(k => fa.getOrElse(k, 0L)).sum
      CountMinSketch.inner(sketch(a), sketch(b)) >= trueJoin
    }

  property("serialized sketch is self-describing and round-trips") =
    Prop.forAll(keys) { xs =>
      val sk = sketch(xs)
      CountMinSketch.geometryOf(sk) == ((Depth, Width)) &&
      CountMinSketch.fromRawBytes(CountMinSketch.toRawBytes(counters(xs))).toSeq ==
        counters(xs).toSeq
    }
}
