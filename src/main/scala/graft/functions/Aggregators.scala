package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators — the engine's UDAF seam (reference S16's
  * pluggable-extractor idea applied to aggregation; SURVEY §2.2 last row).
  *
  * [[GeometricMean]] is the demonstrator: a numerically-stable geometric
  * mean via sum-of-logs, with a mergeable buffer so Catalyst plans it as
  * partial + final aggregation (map-side combine) like any built-in — the
  * property that matters at 100 TB. Registered per-session via
  * `udaf(GeometricMean)` under `geomean`.
  */
object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Aggregators {
  /** Register typed aggregators for SQL/expr use. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("geomean", org.apache.spark.sql.functions.udaf(GeometricMean))
}
