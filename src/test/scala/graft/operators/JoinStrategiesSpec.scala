package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinStrategiesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    // deep traversal: AQE query stages hide their plans from collect(), so a
    // shallow walk undercounts (a zero-assertion would pass vacuously)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val children = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec     => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case a: AdaptiveSparkPlanExec                                      => Seq(a.executedPlan)
        case _                                                             => p.children
      }
      p +: children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("bucketed join plans with zero shuffle exchanges") {
    val li = graft.Tables.lineitem(spark, TestSpark.sfDir)
    val o  = graft.Tables.orders(spark, TestSpark.sfDir)
    // clean both metastore entries and leftover locations from prior JVMs
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_li", "b_o").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"$warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    JoinStrategies.writeBucketed(li.select("l_orderkey", "l_quantity").withColumnRenamed("l_orderkey", "k"), "b_li", "k", 4)
    JoinStrategies.writeBucketed(o.select("o_orderkey", "o_totalprice").withColumnRenamed("o_orderkey", "k"), "b_o", "k", 4)
    // disable broadcast so the join would otherwise shuffle
    val priorThreshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = JoinStrategies.bucketedJoin(spark, "b_li", "b_o", "k")
      assert(shuffleCount(joined) === 0, "bucketed join must not shuffle either side")
      // and it returns the same rows as the plain join
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally priorThreshold match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("salted count equals plain groupBy count") {
    val ev = graft.Tables.events(spark, TestSpark.sfDir)
    val salted = JoinStrategies
      .saltedCount(ev, "event_type", salt = 8)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val plain = ev
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(salted === plain)
  }

  test("salted join equals plain inner join") {
    val li = graft.Tables.lineitem(spark, TestSpark.sfDir).select(col("l_orderkey").as("k"), col("l_quantity"))
    val o  = graft.Tables.orders(spark, TestSpark.sfDir).select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val salted = JoinStrategies.saltedJoin(li, o, "k", salt = 4)
    val plain  = li.join(o, Seq("k"))
    assert(salted.count() === plain.count())
    val sAgg = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pAgg = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sAgg === pAgg)
  }

  test("saltedJoin with explicit saltCols stays equivalent and spreads constant-payload rows") {
    import spark.implicits._
    // one hot key whose payload column is CONSTANT: full-row hashing puts
    // every row in one salt bucket (the documented blind spot); salting
    // from the high-entropy `seq` column spreads them while the join result
    // stays identical.
    val fact = (1 to 400).map(i => (7L, "same-payload", i.toLong)).toDF("k", "payload", "seq")
    val dim  = Seq((7L, "dim-a")).toDF("k", "attr")
    val bySeq = JoinStrategies.saltedJoin(fact, dim, "k", salt = 8, saltCols = Seq("seq"))
    assert(bySeq.count() === 400)
    val buckets = fact
      .withColumn("_salt", pmod(xxhash64(col("seq")), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets > 1, "high-entropy saltCols must occupy more than one salt bucket")
    val fullRow = fact
      .withColumn("_salt", pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select("_salt").distinct().count()
    assert(fullRow === 1, "constant non-key payload collapses full-row hashing to one bucket")
  }

  test("runtime bloom filter lands in the probe side of a selective shuffle join") {
    val prevThresh = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val prevBcast  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // local fixtures are far below the 10 GB production gate — drop it to
      // 0 (and disable broadcast, which would bypass the shuffle join) so
      // the injection path itself is exercised
      JoinStrategies.enableRuntimeBloomFilters(spark, applicationSideScanSizeThreshold = "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li  = graft.Tables.lineitem(spark, TestSpark.sfDir)
      val ord = graft.Tables.orders(spark, TestSpark.sfDir).filter(col("o_orderpriority") === "1-URGENT")
      val j = li
        .join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(
        j.queryExecution.optimizedPlan.toString.toLowerCase.contains("bloom"),
        "optimizer must inject a bloom_filter_agg/might_contain pair on the probe side"
      )
      val expected = li
        .join(ord.hint("broadcast"), li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, "bloom pruning must not change results")
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prevThresh)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
    }
  }
}
