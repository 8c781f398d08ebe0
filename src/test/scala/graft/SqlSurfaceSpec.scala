package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plain SQL as a first-class entry point: after `Tables.registerViews`,
  * `spark.sql(...)` reaches the same tables (same readers, same
  * ns-timestamp handling) and the injected native functions. Each test
  * cross-checks a SQL rendering against the DataFrame-surface result —
  * not against DuckDB (that's Verify's job) but against OUR OWN other
  * API, proving the two surfaces agree.
  */
class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    Tables.registerViews(s, TestSpark.sfDir)
    s
  }

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))

  test("aggregation query matches the DataFrame surface") {
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  cast(sum(l_quantity) as double) AS sum_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )
    import org.apache.spark.sql.functions._
    val df = Tables
      .lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(rows(sql) === rows(df))
  }

  test("event-time window query over the ns-timestamp table works in SQL") {
    val sql = spark.sql(
      """SELECT window(ts, '1 hour').start AS w, count(1) AS n
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 5""".stripMargin
    )
    assert(sql.collect().length === 5)
  }

  test("native function registers and is callable from SQL") {
    functions.VectorFunctions.register(spark)
    val sim = spark
      .sql("SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS s")
      .collect()(0)
      .getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
  }

  test("star join in SQL picks the same broadcast plan family") {
    val sql = spark.sql(
      """SELECT r_name, count(1) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    )
    assert(sql.collect().nonEmpty)
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
