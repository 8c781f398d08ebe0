package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom aggregate must be bit-identical to Spark's built-in
  * `percentile` (which is itself quantile_cont-parity with the DuckDB
  * oracle) — any divergence here would silently move oracle results.
  */
class ExactPercentilesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to built-in percentile on fixture data, grouped and global") {
    ExactPercentiles.register(spark)
    val li = graft.Tables.lineitem(spark, TestSpark.sfDir)

    val grouped = li
      .groupBy($"l_returnflag")
      .agg(
        expr("exact_percentiles(l_extendedprice, 0.25D, 0.5D, 0.75D, 0.95D)").as("mine"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.95D))").as("builtin")
      )
      .collect()
    assert(grouped.nonEmpty)
    grouped.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2), s"group ${r.get(0)}")
    }

    val global = li
      .agg(
        expr("exact_percentiles(l_quantity, 0.0D, 0.37D, 1.0D)").as("mine"),
        expr("percentile(l_quantity, array(0.0D, 0.37D, 1.0D))").as("builtin")
      )
      .collect()(0)
    assert(global.getSeq[Double](0) === global.getSeq[Double](1))
  }

  test("skips nulls, empty group yields null, int input casts like the built-in") {
    ExactPercentiles.register(spark)
    val df = Seq[(String, Option[Int])](
      ("a", Some(1)), ("a", Some(2)), ("a", None), ("a", Some(3)),
      ("b", None)
    ).toDF("k", "v")
    val out = df
      .groupBy($"k")
      .agg(expr("exact_percentiles(v, 0.5D)").as("mine"), expr("percentile(v, array(0.5D))").as("builtin"))
      .orderBy($"k")
      .collect()
    assert(out(0).getSeq[Double](1) === Seq(2.0))
    assert(out(0).getSeq[Double](1) === out(0).getSeq[Double](2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("interpolates between ranks exactly like the built-in formula") {
    ExactPercentiles.register(spark)
    // 4 values, p=0.5 -> pos 1.5 -> (2-1.5)*20 + (1.5-1)*30 = 25.0
    val out = Seq(10.0, 20.0, 30.0, 40.0)
      .toDF("v")
      .agg(expr("exact_percentiles(v, 0.5D)"))
      .collect()(0)
      .getSeq[Double](0)
    assert(out === Seq(25.0))
  }
}
