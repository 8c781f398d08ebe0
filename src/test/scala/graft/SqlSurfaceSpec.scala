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

  test("theta set operations run in plain SQL and agree with the driver-side estimator") {
    functions.KmvSketch.register(spark)
    // two overlapping synthetic sets (multiples of 2 / of 3 under 1000):
    // true jaccard = |mult 6| / |mult 2 or 3| ~ 0.25
    val row = spark
      .sql("""WITH h AS (
             |  SELECT id, conv(substring(md5(cast(id as string)), 1, 8), 16, 10) / 4294967296.0 AS h
             |  FROM range(1000)),
             |s AS (
             |  SELECT kmv_hashes(case when id % 2 = 0 then h end, 64) AS a,
             |         kmv_hashes(case when id % 3 = 0 then h end, 64) AS b
             |  FROM h)
             |SELECT kmv_jaccard(a, b, 64) AS j, kmv_union_est(a, b, 64) AS u,
             |       kmv_intersect_est(a, b, 64) AS i
             |FROM s""".stripMargin)
      .collect()(0)
    val (j, u, i) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))

    // driver-side twin over the same md5-derived hashes
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash(id: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble / 4294967296.0
    }
    val aH = (0L until 1000L).filter(_ % 2 == 0).map(hash).sorted.take(64)
    val bH = (0L until 1000L).filter(_ % 3 == 0).map(hash).sorted.take(64)
    val (jRef, iRef) = functions.KmvSketch.intersectionEstimate(aH, bH, 64)
    assert(math.abs(j - jRef) < 1e-9, s"SQL jaccard $j vs driver $jRef")
    assert(math.abs(i - iRef) < 1e-9, s"SQL intersect $i vs driver $iRef")
    assert(math.abs(j * u - i) < 1e-9, "intersection = jaccard x union by construction")
    // and the estimates are in the right neighborhood of the truth
    assert(j > 0.1 && j < 0.45, s"jaccard estimate $j implausible for true ~0.25")
  }

  test("redact_pii is callable from plain SQL and equals the Column-API transform") {
    val out = spark
      .sql("SELECT redact_pii('ask a@b.io or 555-0101 at 10.1.2.3') AS r")
      .collect()(0)
      .getString(0)
    assert(out === "ask <EMAIL> or <PHONE> at <IP>", out)
    // same expression tree as the Column form on a table round-trip
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql("SELECT redact_pii(text) AS r FROM documents LIMIT 50").collect().map(_.getString(0))
    val viaCol = spark
      .table("documents")
      .select(operators.TextAnalysis.redactPii(col("text")).as("r"))
      .limit(50)
      .collect()
      .map(_.getString(0))
    assert(viaSql.toSeq === viaCol.toSeq)
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
