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

  /** KMV sketch semantics (`q_kmv_distinct` is oracle-exact, but these
    * properties live above any single query): estimates are independent of
    * partitioning (the mergeability that makes partial aggregation valid),
    * within the ~1/sqrt(k-2) error of exact, and merged sketches support
    * intersection estimation.
    */
  test("kmv sketch: partition-invariant (mergeable) and within error bound of exact") {
    graft.functions.KmvSketch.register(spark)
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    def est(parts: Int): Map[String, (Long, Double)] = li
      .select(col("l_returnflag"), col("l_partkey"), h.as("h"))
      .repartition(parts)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("ex"), expr("kmv_hashes(h, 256)").as("hs"))
      .select(col("l_returnflag"), col("ex"), graft.functions.KmvSketch.estimate(col("hs"), 256).as("est"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val one  = est(1)
    val many = est(13)
    assert(one === many, "estimate must not depend on partitioning (mergeable partials)")
    assert(one.nonEmpty)
    one.foreach { case (g, (ex, e)) =>
      // se ~ 1/sqrt(k-2) = 6.3% at k=256; 20% is a ~3-sigma bound
      assert(math.abs(e - ex) / ex < 0.2, s"group $g: kmv $e vs exact $ex")
    }
  }

  test("kmv sketch: merge == sketch of union; duplicates don't re-count (unit)") {
    def state(vals: Seq[Double], k: Int = 8): graft.functions.KmvState = {
      val st = new graft.functions.KmvState(new Array[Double](k), 0)
      vals.foreach(st.insert)
      st
    }
    // unsorted insertion order on purpose: exercises mid-array inserts
    val xs = scala.util.Random.shuffle((1 to 50).toList).map(i => i / 101.0)
    val (a, b) = xs.splitAt(25)
    val sa = state(a)
    assert(state(a).mergeWith(state(b)).toSeq === state(xs).toSeq)
    sa.insert(a.head)
    assert(sa.toSeq === state(a).toSeq, "re-adding a seen hash must not change the sketch")
    assert(state(xs).toSeq === xs.distinct.sorted.take(8), "k smallest distinct, ascending")
  }

  test("kmv sketch: intersection/jaccard estimate from merged sketches (theta-sketch capability)") {
    // A = 1..3000, B = 2001..5000: |A ∩ B| = 1000, |A ∪ B| = 5000, J = 0.2
    def hash(i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    val k = 256
    def sketch(r: Range): Seq[Double] = {
      val st = new graft.functions.KmvState(new Array[Double](k), 0)
      r.foreach(i => st.insert(hash(i)))
      st.toSeq
    }
    val (jac, inter) =
      graft.functions.KmvSketch.intersectionEstimate(sketch(1 to 3000), sketch(2001 to 5000), k)
    assert(math.abs(jac - 0.2) < 0.08, s"jaccard estimate $jac vs true 0.2")
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.25, s"intersection estimate $inter vs true 1000")
  }

  /** The column-expression twin (`q_kmv_intersect`'s path) must agree with
    * the driver-side estimator on the same sketches.
    */
  test("kmv sketch: intersectColumns matches driver-side intersectionEstimate") {
    graft.functions.KmvSketch.register(spark)
    val li = Tables.lineitem(spark, TestSpark.sfDir)
    val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val sk = li
      .filter(col("l_returnflag").isin("A", "N"))
      .select(col("l_returnflag"), h.as("h"))
      .groupBy(col("l_returnflag"))
      .agg(expr("kmv_hashes(h, 256)").as("hs"))
    val a = sk.filter(col("l_returnflag") === "A").select(col("hs").as("hs_a"))
    val b = sk.filter(col("l_returnflag") === "N").select(col("hs").as("hs_b"))
    val (jc, uc, ic) = graft.functions.KmvSketch.intersectColumns(col("hs_a"), col("hs_b"), 256)
    val row = a.crossJoin(broadcast(b))
      .select(jc.as("j"), uc.as("u"), ic.as("i"), col("hs_a"), col("hs_b"))
      .collect()(0)
    val (jd, id) = graft.functions.KmvSketch.intersectionEstimate(
      row.getSeq[Double](3),
      row.getSeq[Double](4),
      256
    )
    assert(math.abs(row.getDouble(0) - jd) < 1e-12, "jaccard: column path vs driver path")
    assert(math.abs(row.getDouble(2) - id) < 1e-9, "intersection: column path vs driver path")
    assert(row.getDouble(1) > 0 && row.getDouble(0) >= 0 && row.getDouble(0) <= 1)
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

  test("q_percentile_sampled: sampled p50's rank in the FULL data is near 0.5") {
    import org.apache.spark.sql.functions._
    val sampled = graft.SparkEntry
      .queries("q_percentile_sampled")(spark, TestSpark.sfDir)
      .select(col("l_returnflag"), col("n_sampled"), col("p50"))
    val ranked = graft.Tables
      .lineitem(spark, TestSpark.sfDir)
      .join(broadcast(sampled), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        avg((col("l_extendedprice") <= col("p50")).cast("double")).as("rank50"),
        min(col("n_sampled")).as("n_sampled")
      )
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      // binomial rank error at ~10% sampling: 3 * sqrt(0.25 / n_sampled)
      val tol = 3 * math.sqrt(0.25 / r.getAs[Long]("n_sampled")) + 0.01
      assert(math.abs(r.getAs[Double]("rank50") - 0.5) <= tol,
        s"sampled p50 rank ${r.getAs[Double]("rank50")} off for group ${r.get(0)} (tol $tol)")
    }
  }

  test("q_hll_md5_union: merged registers estimate the union within envelope, never below a segment") {
    val r = graft.SparkEntry
      .queries("q_hll_md5_union")(spark, TestSpark.sfDir)
      .collect()
      .head
    val exact = r.getAs[Long]("n_exact_union").toDouble
    val (a, b, u) = (r.getAs[Double]("hll_a"), r.getAs[Double]("hll_b"), r.getAs[Double]("hll_union"))
    // max-merge is monotone: the union registers dominate each segment's
    assert(u >= a - 1e-9 && u >= b - 1e-9, s"union estimate $u below a segment ($a, $b)")
    assert(math.abs(u - exact) / exact <= 3 * 1.04 / 16.0, s"union estimate $u too far from exact $exact")
  }

  test("q_hll_md5: reproducible-hash HLL estimate within the m=256 error envelope of exact") {
    // standard error for HLL at m=256 is ~1.04/sqrt(256) = 6.5%; allow 3
    // sigma. The oracle gate proves DuckDB reproduces the NUMBER; this
    // proves the number is a sane cardinality estimate.
    val rows = graft.SparkEntry
      .queries("q_hll_md5")(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est   = r.getAs[Double]("hll_est")
      assert(math.abs(est - exact) / exact <= 3 * 1.04 / 16.0,
        s"estimate $est too far from exact $exact for group ${r.get(0)}")
    }
  }
}
