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

  /** Error-bound spec for `q_approx_distinct` (its rows-only correctness
    * check can't see values): the query uses rsd 0.02, so a 5%-of-exact
    * assertion is a 2.5-sigma bound (at the 0.05 default it is 1 sigma and
    * legitimately fails ~1/3 of the time — observed on group N's
    * l_orderkey). HLL++ is deterministic on fixed data, so this is stable,
    * and a sketch that returned garbage inside the right row count now
    * fails here.
    */
  test("approx_count_distinct within 5% of exact per group (q_approx_distinct bound)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val rows = li
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        countDistinct(col("l_partkey")).as("ex_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("apx_orders"),
        countDistinct(col("l_orderkey")).as("ex_orders")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def relErr(apx: Long, ex: Long) = math.abs(apx - ex).toDouble / ex
      assert(
        relErr(r.getAs[Long]("apx_parts"), r.getAs[Long]("ex_parts")) < 0.05,
        s"parts estimate off >5% for group ${r.get(0)}: $r"
      )
      assert(
        relErr(r.getAs[Long]("apx_orders"), r.getAs[Long]("ex_orders")) < 0.05,
        s"orders estimate off >5% for group ${r.get(0)}: $r"
      )
    }
  }

  /** Error-bound spec for `q_approx_percentile`: approx_percentile(accuracy
    * 10000) guarantees rank error <= 1/accuracy = 1e-4 and returns an actual
    * data element. We re-rank the returned element within its group and
    * assert its empirical rank is within 0.5% of the target quantile — 50x
    * the documented sketch bound, leaving room for the +-1/n discreteness of
    * small fixture groups while still failing on any broken sketch (a wrong
    * value on l_extendedprice's near-continuous distribution shifts rank
    * far beyond 0.5%).
    */
  test("approx_percentile rank error within bound per group (q_approx_percentile bound)") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val apx = li
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95")
      )
    // empirical rank of the returned element = fraction of group values <= it
    val ranked = li
      .join(apx, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        avg((col("l_extendedprice") <= col("ap50")).cast("double")).as("rank50"),
        avg((col("l_extendedprice") <= col("ap95")).cast("double")).as("rank95"),
        count(lit(1)).as("n")
      )
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      val tol = 0.005 + 1.0 / r.getAs[Long]("n") // sketch bound + discreteness
      assert(
        math.abs(r.getAs[Double]("rank50") - 0.5) <= tol,
        s"p50 rank ${r.getAs[Double]("rank50")} off target for group ${r.get(0)}"
      )
      assert(
        math.abs(r.getAs[Double]("rank95") - 0.95) <= tol,
        s"p95 rank ${r.getAs[Double]("rank95")} off target for group ${r.get(0)}"
      )
    }
  }
}
