package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored item for [[TopK]]: `score` ranks desc, `key` breaks ties asc. */
case class Scored(score: Double, key: Long)

/** Mergeable buffer (kept sorted, at most k items). */
case class TopKBuf(items: Seq[Scored])

/** Per-group top-k as a TYPED AGGREGATE rather than a ranking window.
  *
  * Why this exists (SCALE.md): `row_number().over(partitionBy(g).orderBy(s))`
  * shuffles EVERY row of the fact table to sort it, then discards all but k
  * per group. As an `Aggregator`, top-k participates in partial aggregation:
  * each map task keeps at most k rows per group, the shuffle carries
  * O(groups x k x partitions) instead of O(rows), and merge is an O(k)
  * sorted-list merge. At 100 TB with k=3 this is orders of magnitude less
  * network.
  *
  * Deterministic: ordering is (score desc, key asc) — total, so results are
  * reproducible and oracle-checkable against the window formulation.
  */
class TopK(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.key))

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, x: Scored): TopKBuf =
    if (b.items.size >= k && ord.gteq(x, b.items.last)) b
    else TopKBuf(((b.items :+ x).sorted(ord)).take(k))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sorted(ord).take(k))

  override def finish(b: TopKBuf): Seq[Scored] = b.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Register `topk_<k>(struct(score, key))` for the given k. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int): String = {
    val name = s"topk_$k"
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(new TopK(k), Encoders.product[Scored]))
    name
  }
}
