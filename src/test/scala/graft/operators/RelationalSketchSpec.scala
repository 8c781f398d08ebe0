package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property that makes HLL sketches usable at 100 TB: partial sketches
  * built independently (per partition / per day / per shard) UNION to the
  * same estimate as one sketch over everything — re-aggregation without
  * rescanning. Also sanity-bounds the estimate against the exact count.
  */
class RelationalSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hll union of per-group partial sketches equals the global sketch estimate") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val whole = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").as("est"))
      .collect()(0)
      .getLong(0)
    val merged = li
      .groupBy(col("l_returnflag")) // partials per group, then union
      .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
      .collect()(0)
      .getLong(0)
    assert(merged === whole, "sketch merge must be lossless")
    val exact = li.select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05, s"estimate $merged vs exact $exact")
  }
}
