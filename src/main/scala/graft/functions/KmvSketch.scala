package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable buffer: up to k distinct hash values, kept sorted ascending. */
case class KmvBuf(hs: Seq[Double])

/** KMV (k-minimum-values) distinct sketch — the theta-sketch family's
  * simplest member (Pinot serves the same estimator class as
  * DISTINCTCOUNTTHETASKETCH; Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * Keep the k smallest DISTINCT uniform hashes of the values; if fewer than
  * k are seen the sketch is exact (it holds every distinct hash), otherwise
  * estimate = (k-1) / h_(k) — the k-th smallest hash of a uniform [0,1)
  * sample pins down the density. Standard error ~ 1/sqrt(k-2) (~6.3% at
  * k=256).
  *
  * Why this exists next to the native HLL pair (`q_hll_sketch`): KMV's
  * estimate is a pure order statistic of engine-reproducible md5 hashes, so
  * — uniquely among the sketches here — the DuckDB oracle can recompute it
  * EXACTLY (hash-match, not rows-only): the caller feeds
  * `md5-prefix/2^32` doubles and the oracle takes `row_number() = k` over
  * the same distinct hashes. And unlike HLL, a KMV sketch supports
  * set INTERSECTION estimates (via the Jaccard of merged sketches), which
  * is the theta-sketch capability HLL lacks.
  *
  * Scale: a typed Aggregator, so it participates in partial aggregation —
  * map tasks keep at most k doubles per group, the shuffle carries
  * O(groups x k x partitions), and merge is a sorted distinct-union
  * truncation. Same network math as [[TopK]].
  */
class KmvSketch(k: Int) extends Aggregator[Double, KmvBuf, Double] {

  override def zero: KmvBuf = KmvBuf(Seq.empty)

  override def reduce(b: KmvBuf, h: Double): KmvBuf =
    // full buffer and h beyond the horizon: no change (the common case)
    if (b.hs.size >= k && h >= b.hs.last) b
    else if (b.hs.contains(h)) b // DISTINCT hashes: duplicates don't re-count
    else KmvBuf(((b.hs :+ h).sorted).take(k))

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    KmvBuf((a.hs ++ b.hs).distinct.sorted.take(k))

  /** Estimate of the distinct-hash count: exact below k, (k-1)/h_(k) at k. */
  override def finish(b: KmvBuf): Double =
    if (b.hs.size < k) b.hs.size.toDouble else (k - 1).toDouble / b.hs.last

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {
  /** Register `kmv_<k>(hash_double)` for the given k. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int): String = {
    val name = s"kmv_$k"
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(new KmvSketch(k), Encoders.scalaDouble))
    name
  }

  /** Set-operation estimates from two k-filled sketches (the theta-sketch
    * capability HLL lacks): among the k smallest hashes of the union, the
    * fraction present in BOTH sketches estimates the Jaccard similarity,
    * and jaccard x union-estimate gives |A ∩ B| (Beyer et al. 2007 §5).
    * Returns (jaccard_est, intersection_est).
    */
  def intersectionEstimate(a: KmvBuf, b: KmvBuf, k: Int): (Double, Double) = {
    val union = (a.hs ++ b.hs).distinct.sorted.take(k)
    val aSet  = a.hs.toSet
    val bSet  = b.hs.toSet
    val both  = union.count(h => aSet(h) && bSet(h))
    val jaccard  = if (union.isEmpty) 0.0 else both.toDouble / union.size
    val unionEst = if (union.size < k) union.size.toDouble else (k - 1).toDouble / union.last
    (jaccard, jaccard * unionEst)
  }
}
