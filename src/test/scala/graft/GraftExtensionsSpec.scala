package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make the native functions usable from
  * plain SQL in a session configured ONLY with `spark.sql.extensions` —
  * the cluster-deployment path (no library calls before first query).
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  // extensions only apply when a NEW SparkSession is constructed — with a
  // default session present, getOrCreate returns it and silently ignores
  // withExtensions (verified). Clear the default so the builder constructs
  // a fresh session over the shared SparkContext, then restore it for the
  // other suites.
  private lazy val spark: SparkSession = {
    val shared = TestSpark.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  override def beforeAll(): Unit = {
    Tables.applyConfs(spark)
  }

  test("cosine_sim resolves from SQL without a register() call") {
    val r = spark
      .sql("SELECT cosine_sim(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) AS c")
      .collect()(0)
      .getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("rolling_hash resolves from SQL and matches the registered form") {
    functions.RollingHash.register(spark)
    val Array(a, b) = spark
      .sql("SELECT rolling_hash('graft') AS viaExt, rolling_hash('graft') AS viaReg")
      .collect()(0)
      .toSeq
      .toArray
    assert(a === b)
  }

  test("kmv_hashes resolves from SQL without a register() call") {
    val hs = spark
      .sql("SELECT kmv_hashes(h, 4) AS hs FROM (SELECT cast(id % 7 as double) / 10 AS h FROM range(100))")
      .collect()(0)
      .getSeq[Double](0)
    assert(hs === Seq(0.0, 0.1, 0.2, 0.3), "4 smallest distinct hashes, ascending")
  }

  test("cms_agg + cms_query resolve from SQL without a register() call") {
    // 100 rows of key id%4: every estimate >= the true 25, exact when no
    // bucket of a key collides with another key's bucket in every row
    val est = spark
      .sql("""SELECT cms_query(sk, array(cast(id % 8 as int), cast(id % 8 as int))) AS est
             |FROM (
             |  SELECT cms_agg(array(cast(k % 8 as int), cast(k % 8 as int)), 2, 8) AS sk
             |  FROM (SELECT id % 4 AS k FROM range(100))
             |) CROSS JOIN (SELECT 0 AS id)""".stripMargin)
      .collect()(0)
      .getLong(0)
    assert(est == 25L, s"collision-free CMS point query must be exact, got $est")
  }

  test("kmv_estimate composes with kmv_hashes in plain SQL (exact below k, order statistic at k)") {
    // 7 distinct hashes, k=16 > 7: the sketch holds the full set -> exact 7
    val exact = spark
      .sql("SELECT kmv_estimate(kmv_hashes(h, 16), 16) AS e FROM (SELECT cast(id % 7 as double) / 10 AS h FROM range(100))")
      .collect()(0)
      .getDouble(0)
    assert(exact === 7.0, "below k the estimate is the exact distinct count")
    // 100 distinct uniform hashes, k=4: estimate = 3 / h_(4) = 3 / (3/99)
    val atK = spark
      .sql("SELECT kmv_estimate(kmv_hashes(h, 4), 4) AS e FROM (SELECT cast(id as double) / 99 AS h FROM range(100))")
      .collect()(0)
      .getDouble(0)
    assert(math.abs(atK - 99.0) < 1e-9, s"k-th order statistic estimate, got $atK")
  }

  test("kmv set-operation estimators resolve from SQL without a register() call") {
    // identical sketches: jaccard 1, union = intersect = exact distinct count
    val row = spark
      .sql("""WITH s AS (
             |  SELECT kmv_hashes(h, 16) AS a, kmv_hashes(h, 16) AS b
             |  FROM (SELECT cast(id % 7 as double) / 10 AS h FROM range(100)))
             |SELECT kmv_jaccard(a, b, 16), kmv_union_est(a, b, 16), kmv_intersect_est(a, b, 16)
             |FROM s""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) === 1.0 && row.getDouble(1) === 7.0 && row.getDouble(2) === 7.0)
    // disjoint sketches: jaccard 0, intersection 0
    val dis = spark
      .sql("""WITH s AS (
             |  SELECT kmv_hashes(case when id < 50 then h end, 64) AS a,
             |         kmv_hashes(case when id >= 50 then h end, 64) AS b
             |  FROM (SELECT id, cast(id as double) / 100 AS h FROM range(100)))
             |SELECT kmv_jaccard(a, b, 64), kmv_intersect_est(a, b, 64) FROM s""".stripMargin)
      .collect()(0)
    assert(dis.getDouble(0) === 0.0 && dis.getDouble(1) === 0.0)
    // both sketches empty: 0/0 must be defined as 0.0 (NOT NULL), agreeing
    // with the driver-side twin intersectionEstimate on the empty union
    val empty = spark
      .sql("""WITH s AS (
             |  SELECT kmv_hashes(cast(null as double), 16) AS a,
             |         kmv_hashes(cast(null as double), 16) AS b
             |  FROM range(5))
             |SELECT kmv_jaccard(a, b, 16), kmv_union_est(a, b, 16), kmv_intersect_est(a, b, 16)
             |FROM s""".stripMargin)
      .collect()(0)
    assert(!empty.isNullAt(0) && empty.getDouble(0) === 0.0, "empty-sketch jaccard must be 0.0, not NULL")
    assert(empty.getDouble(1) === 0.0 && empty.getDouble(2) === 0.0)
    assert(functions.KmvSketch.intersectionEstimate(Nil, Nil, 16) === ((0.0, 0.0)))
  }

  test("wrong arity raises an analysis error naming the signature, not an index error") {
    // Deliberately replace every extension-injected builder with the
    // register() path first — both entry points must share the same
    // arity-checked builders (this is the exact regression shape of round 3:
    // register() clobbering the extension builder with an unchecked one).
    functions.RollingHash.register(spark)
    functions.VectorFunctions.register(spark)
    functions.ExactPercentiles.register(spark)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(cast(1.0 as float)))").collect()
    }
    assert(e1.getMessage.contains("cosine_sim"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT exact_percentiles(1.0)").collect()
    }
    assert(e2.getMessage.contains("exact_percentiles"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT rolling_hash('a', 'b')").collect()
    }
    assert(e3.getMessage.contains("rolling_hash"))
    functions.KmvSketch.register(spark)
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_hashes(1.0)").collect()
    }
    assert(e4.getMessage.contains("kmv_hashes"))
  }
}
