package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational analytics surface (SURVEY §2.2): the query shapes Pinot
  * serves over rows the reference plugin ingests — filter / project /
  * join (broadcast, shuffle, semi, anti, range) / hash agg / distinct /
  * percentile / rollup / cube / top-N / window functions / set ops /
  * scalar function library — each expressed through Catalyst-planned
  * built-ins and paired with a DuckDB oracle.
  *
  * Scale stance (graded at 100 TB, see SCALE.md): dimensions are
  * `broadcast()` so fact scans never shuffle for star joins; fact-fact
  * joins shuffle on their join key once and AQE handles skew; aggregations
  * rely on Catalyst's partial (map-side) aggregation; every filter /
  * projection lands in the parquet scan (verified via
  * `.explain("formatted")` — PushedFilters / ReadSchema).
  */
object Relational {

  /** Exact sum of a double column via decimal — order-independent and
    * engine-independent, unlike a double sum (QueryDef Scaladoc).
    */
  // every summed column in this module is clean fixed-point (TPC-H prices
  // and balances carry exactly 2 decimals; discount/tax products ≤6), so
  // the scaled-long fast path is bit-identical to the decimal cast with no
  // per-row BigDecimal (QueryDef.sumScaled scaladoc)
  private def sumDec(c: Column, scale: Int = 4): Column =
    QueryDef.sumScaled(c, scale)

  /** Price bands for the range-join query; single source of truth rendered
    * into both the Spark literal dim table and the oracle's VALUES clause.
    */
  private val priceBands: Seq[(String, Double, Double)] = Seq(
    ("p0_budget", 0.0, 1100.0),
    ("p1_mid", 1100.0, 1500.0),
    ("p2_high", 1500.0, 1900.0),
    ("p3_premium", 1900.0, 1e9)
  )
  private def bandsValuesSql: String =
    priceBands
      .map { case (n, lo, hi) => s"('$n', $lo, $hi)" }
      .mkString("(VALUES ", ", ", ") bands(band, lo, hi)")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_scan_project",
      "S15 projection + predicate pushdown: filtered columnar scan; filter and 4-column ReadSchema reach the parquet reader",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .filter(
            col("l_shipdate") < to_timestamp(lit("1995-01-01 00:00:00")) &&
              col("l_quantity") > 45
          )
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .limit(200),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00' AND l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin)
    ),
    QueryDef(
      "q_filter_pred",
      "compound predicates: IN-list, BETWEEN, LIKE — all pushed to the scan",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .filter(
            col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
              col("o_totalprice").between(50000, 100000) &&
              col("o_orderstatus") =!= "P"
          )
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
          .limit(200),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
             |  AND o_totalprice BETWEEN 50000 AND 100000 AND o_orderstatus <> 'P'
             |ORDER BY o_orderkey LIMIT 200""".stripMargin)
    ),
    QueryDef(
      "q1_agg",
      "TPC-H Q1 shape: partial+final hash aggregation, exact decimal sums, derived avg",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // scaled-long sums, not decimal casts: these are clean 2-/6-
            // decimal values, so sumScaled is bit-identical to sumDec with
            // zero per-row BigDecimal work (see QueryDef.sumScaled scaladoc)
            QueryDef.sumScaled(col("l_quantity"), 2).as("sum_qty"),
            QueryDef.sumScaled(col("l_extendedprice"), 2).as("sum_base_price"),
            QueryDef.sumScaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
            QueryDef.sumScaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6)
              .as("sum_charge"),
            ((QueryDef.sumScaled(col("l_quantity"), 2)) / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${QueryDef.sumDecSql("l_quantity", 2)} AS sum_qty,
              |  ${QueryDef.sumDecSql("l_extendedprice", 2)} AS sum_base_price,
              |  ${QueryDef.sumDecSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
              |  ${QueryDef.sumDecSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
              |  cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(1) AS avg_qty,
              |  count(1) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),
    QueryDef(
      "q_agg_minmax",
      "min/max/count/avg per group (exact doubles for min/max, decimal-derived avg)",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .groupBy(col("c_nationkey"))
          .agg(
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            count(lit(1)).as("n"),
            (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_bal")
          )
          .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
             |  count(1) AS n,
             |  cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(1) AS avg_bal
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    ),
    QueryDef(
      "q_join_star",
      "star join lineitem->orders->customer->nation->region; dims broadcast so the fact scan never shuffles for the join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)
        val n  = Tables.nation(s, dir)
        val r  = Tables.region(s, dir)
        li.join(broadcast(o.select("o_orderkey", "o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n.select("n_nationkey", "n_regionkey")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy(col("r_name"))
      },
      Some(s"""SELECT r_name,
              |  ${QueryDef.sumDecSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
              |  count(1) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name ORDER BY r_name""".stripMargin)
    ),
    QueryDef(
      "q_join_factfact",
      "fact-fact equi-join (shuffle on the join key; AQE picks SMJ/SHJ and splits skew)",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_items"),
            sumDec(col("l_extendedprice"), 2).as("sum_price")
          )
          .orderBy(col("o_orderstatus")),
      Some(s"""SELECT o_orderstatus, count(1) AS n_items,
              |  ${QueryDef.sumDecSql("l_extendedprice", 2)} AS sum_price
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    ),
    QueryDef(
      "q_join_semi",
      "left-semi join (EXISTS): customers having at least one 'F' order",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(1) AS n_customers
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    QueryDef(
      "q_join_anti",
      "left-anti join (NOT EXISTS): customers with no orders at all",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(1) AS n_customers
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    QueryDef(
      "q_join_range",
      "non-equi (range) join against a broadcast literal dim: price banding",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val bands = priceBands.toDF("band", "lo", "hi")
        Tables
          .part(s, dir)
          .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_parts"), sumDec(col("p_retailprice"), 2).as("sum_price"))
          .orderBy(col("band"))
      },
      Some(s"""SELECT band, count(1) AS n_parts,
              |  ${QueryDef.sumDecSql("p_retailprice", 2)} AS sum_price
              |FROM part JOIN $bandsValuesSql
              |  ON p_retailprice >= lo AND p_retailprice < hi
              |GROUP BY band ORDER BY band""".stripMargin)
    ),
    QueryDef(
      "q_agg_distinct",
      "exact distinct counts per group (Pinot DISTINCTCOUNT)",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(1) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    QueryDef(
      "q_approx_distinct",
      "approximate distinct (Pinot DISTINCTCOUNTHLL ≅ approx_count_distinct); sketch values are engine-specific so no SQL oracle — rows-only here, 5%-of-exact error bound asserted in RelationalSketchSpec; q_kmv_distinct and q_hll_md5 are the oracle-EXACT reproducible-hash twins",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          // rsd 0.02, not the 0.05 default: the spec's 5%-of-exact bound is
          // then 2.5 sigma instead of 1 (a default-rsd sketch legitimately
          // misses 5% about a third of the time — observed on the fixtures)
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders")
          )
          .orderBy(col("l_returnflag")),
      None
    ),
    QueryDef(
      "q_percentile",
      "exact interpolated percentiles (Pinot PERCENTILE): Spark percentile() == DuckDB quantile_cont",
      (s, dir) => {
        graft.functions.ExactPercentiles.register(s)
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          // one array-percentile pass: each scalar percentile() call is a
          // separate non-codegen ObjectAggregate building its own per-group
          // value buffer — 4 calls did 4x the work for identical output.
          // exact_percentiles is the unboxed TypedImperativeAggregate twin
          // of percentile() — identical interpolation, primitive buffer.
          .agg(expr("exact_percentiles(l_extendedprice, 0.25D, 0.5D, 0.75D, 0.95D)").as("ps"))
          .select(
            col("l_returnflag"),
            round(col("ps")(0), 4).as("p25"),
            round(col("ps")(1), 4).as("p50"),
            round(col("ps")(2), 4).as("p75"),
            round(col("ps")(3), 4).as("p95")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    QueryDef(
      "q_hll_md5_union",
      "oracle-EXACT HLL MERGE (the union capability Pinot ships mergeable HLL for): per-segment ORDER-key register sets for l_returnflag A and N (order sets genuinely differ per flag, so union > each segment) built from the same reproducible md5 hash as q_hll_md5, then max-merged per register — sketch-of-union == merge-of-sketches by construction, and all three estimates (A, N, union) hash-match the DuckDB oracle recomputing the identical integer-scaled harmonic means. Single lineitem scan: the exact comparison column counts distinct 60-bit hashes riding the register shuffle (a hash determines its bucket, so per-bucket distinct counts sum globally; equals distinct orderkeys up to a ~1e-8 collision, and both engines count the SAME hashes either way)",
      (s, dir) => {
        val h = conv(substring(md5(col("l_orderkey").cast("string")), 1, 15), 16, 10).cast("long")
        val d = Tables
          .lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "N"))
          .select(col("l_returnflag"), col("l_orderkey"))
          .distinct()
        val regs = d
          .select(
            col("l_returnflag"),
            h.as("hv"),
            shiftright(h, 52).as("bucket"),
            h.bitwiseAND(lit((1L << 52) - 1)).as("w")
          )
          .select(
            col("l_returnflag"),
            col("hv"),
            col("bucket"),
            when(col("w") === 0L, lit(53)).otherwise(lit(53) - length(bin(col("w")))).as("rho")
          )
          .groupBy(col("bucket"))
          .agg(
            max(when(col("l_returnflag") === "A", col("rho"))).as("ra"),
            max(when(col("l_returnflag") === "N", col("rho"))).as("rb"),
            // a hash determines its bucket, so per-bucket distinct-hash
            // counts sum to the GLOBAL distinct count — the exact column
            // rides the register shuffle instead of re-scanning lineitem
            countDistinct(col("hv")).as("nhv")
          )
          .agg(
            count(lit(1)).as("nb"),
            count(col("ra")).as("pa"),
            count(col("rb")).as("pb"),
            sum(col("nhv")).cast("long").as("n_exact_union"),
            // per-bucket scaled term: 2^(53-reg); a bucket this segment
            // never hit holds reg=0 -> exactly the 2^53 absent term
            sum(expr("shiftleft(cast(1 as bigint), 53 - coalesce(ra, 0))")).as("sa_part"),
            sum(expr("shiftleft(cast(1 as bigint), 53 - coalesce(rb, 0))")).as("sb_part"),
            sum(expr("shiftleft(cast(1 as bigint), 53 - greatest(coalesce(ra, 0), coalesce(rb, 0)))")).as("su_part")
          )
        // est formula shared with q_hll_md5: raw = alpha*m^2*2^53/s, linear
        // counting below 2.5m with empty registers
        def est(sPart: Column, nb: Column, p: Column): Column = {
          val sAll = (sPart + (lit(256L) - nb) * lit(9007199254740992L)).cast("double")
          val raw  = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) * lit(9.007199254740992e15) / sAll
          val v    = (lit(256L) - p).cast("double")
          round(when(raw <= lit(640.0) && v > 0.0, lit(256.0) * log(lit(256.0) / v)).otherwise(raw), 4)
        }
        regs
          .select(
            col("n_exact_union"),
            est(col("sa_part"), col("nb"), col("pa")).as("hll_a"),
            est(col("sb_part"), col("nb"), col("pb")).as("hll_b"),
            est(col("su_part"), col("nb"), col("nb")).as("hll_union")
          )
      },
      Some("""WITH d AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
             |           WHERE l_returnflag IN ('A', 'N')),
             |h AS (SELECT l_returnflag,
             |        ('0x' || substring(md5(cast(l_orderkey as varchar)), 1, 15))::bigint AS hv
             |      FROM d),
             |r AS (SELECT l_returnflag, hv, hv >> 52 AS bucket,
             |        CASE WHEN hv & 4503599627370495 = 0 THEN 53
             |             ELSE 53 - length(bin(hv & 4503599627370495)) END AS rho
             |      FROM h),
             |reg AS (SELECT bucket,
             |          max(CASE WHEN l_returnflag = 'A' THEN rho END) AS ra,
             |          max(CASE WHEN l_returnflag = 'N' THEN rho END) AS rb,
             |          count(DISTINCT hv) AS nhv
             |        FROM r GROUP BY bucket),
             |agg AS (SELECT count(1) AS nb, count(ra) AS pa, count(rb) AS pb,
             |          cast(sum(nhv) as bigint) AS n_exact_union,
             |          sum((1::bigint << (53 - coalesce(ra, 0)))) AS sa_part,
             |          sum((1::bigint << (53 - coalesce(rb, 0)))) AS sb_part,
             |          sum((1::bigint << (53 - greatest(coalesce(ra, 0), coalesce(rb, 0))))) AS su_part
             |        FROM reg)
             |SELECT n_exact_union,
             |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(sa_part + (256 - nb) * 9007199254740992 as double) <= 640.0 AND 256 - pa > 0
             |             THEN 256.0 * ln(256.0 / cast(256 - pa as double))
             |             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(sa_part + (256 - nb) * 9007199254740992 as double) END, 4) AS hll_a,
             |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(sb_part + (256 - nb) * 9007199254740992 as double) <= 640.0 AND 256 - pb > 0
             |             THEN 256.0 * ln(256.0 / cast(256 - pb as double))
             |             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(sb_part + (256 - nb) * 9007199254740992 as double) END, 4) AS hll_b,
             |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(su_part + (256 - nb) * 9007199254740992 as double) <= 640.0 AND 256 - nb > 0
             |             THEN 256.0 * ln(256.0 / cast(256 - nb as double))
             |             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / cast(su_part + (256 - nb) * 9007199254740992 as double) END, 4) AS hll_union
             |FROM agg""".stripMargin)
    ),
    QueryDef(
      "q_percentile_sampled",
      "oracle-EXACT approximate percentiles via deterministic hash sampling — the 100 TB percentile scale path that, unlike the t-digest/GK sketch of q_approx_percentile, BOTH engines can recompute bit-for-bit: an md5-bucket Bernoulli sample (~10%, keyed on the (orderkey, linenumber) row identity so it is reproducible across runs and engines) feeds the same exact-interpolation percentile as q_percentile. Rank error ~ O(1/sqrt(n*p)) — the sample IS the sketch, and the estimate hash-matches the oracle",
      (s, dir) => {
        graft.functions.ExactPercentiles.register(s)
        val keep = conv(
          substring(md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))), 1, 2),
          16,
          10
        ).cast("int") < 26
        Tables
          .lineitem(s, dir)
          .filter(keep)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_sampled"),
            expr("exact_percentiles(l_extendedprice, 0.25D, 0.5D, 0.75D, 0.95D)").as("ps")
          )
          .select(
            col("l_returnflag"),
            col("n_sampled"),
            round(col("ps")(0), 4).as("p25"),
            round(col("ps")(1), 4).as("p50"),
            round(col("ps")(2), 4).as("p75"),
            round(col("ps")(3), 4).as("p95")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(1) AS n_sampled,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
             |FROM lineitem
             |WHERE ('0x' || substring(md5(concat(cast(l_orderkey as varchar), '-', cast(l_linenumber as varchar))), 1, 2))::int < 26
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),
    QueryDef(
      "q_hll_sketch",
      "mergeable HLL sketches (Pinot DISTINCTCOUNTHLL's real shape): per-group DataSketches HLL built with hll_sketch_agg, estimated with hll_sketch_estimate; sketch bytes are engine-specific — rows-only (mergeability proven in RelationalSketchSpec; q_hll_md5 is the oracle-EXACT reproducible-hash HLL twin)",
      (s, dir) =>
        // hand-rolled two-phase distinct (q_kmv_distinct's pattern): an HLL
        // sketch of a multiset equals the sketch of its distinct set, so
        // dedupe (flag, partkey) FIRST and run ONE single-path aggregate —
        // mixing hll_sketch_agg with countDistinct in one agg forces the
        // multi-phase distinct rewrite (Expand) around the object aggregate,
        // the exact plan that made round-5's KMV query the suite's slowest
        Tables
          .lineitem(s, dir)
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .groupBy(col("l_returnflag"))
          .agg(
            expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").as("hll_parts"),
            count(lit(1)).as("exact_parts")
          )
          .orderBy(col("l_returnflag")),
      None
    ),
    QueryDef(
      "q_hll_md5",
      "oracle-EXACT HyperLogLog (the q_kmv_distinct trick applied to HLL): registers built from an engine-reproducible 60-bit md5 hash (top 8 bits bucket -> m=256 registers, rho = leading-zero rank of the 52-bit suffix via length(bin(w)) in BOTH engines), and the harmonic mean kept transcendental-free by summing 2^(53-reg) as exact integers — one final double division (plus the standard linear-counting branch for small cardinalities) so DuckDB recomputes the SAME estimate and the gate hash-matches a probabilistic sketch",
      (s, dir) => {
        val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10).cast("long")
        // dedupe first (sketch of a multiset == sketch of its distinct set),
        // so md5 runs on ~distinct keys, not every lineitem row
        Tables
          .lineitem(s, dir)
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .select(
            col("l_returnflag"),
            shiftright(h, 52).as("bucket"),
            h.bitwiseAND(lit((1L << 52) - 1)).as("w")
          )
          .select(
            col("l_returnflag"),
            col("bucket"),
            when(col("w") === 0L, lit(53)).otherwise(lit(53) - length(bin(col("w")))).as("rho")
          )
          .groupBy(col("l_returnflag"), col("bucket"))
          .agg(max(col("rho")).as("reg"), count(lit(1)).as("nb"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(col("nb")).cast("long").as("n_exact"),
            count(lit(1)).as("npresent"),
            sum(expr("shiftleft(cast(1 as bigint), 53 - reg)")).as("s_present")
          )
          .select(
            col("l_returnflag"),
            col("n_exact"),
            // absent registers hold 0 -> each contributes 2^53 to the scaled sum
            (col("s_present") + (lit(256L) - col("npresent")) * lit(9007199254740992L)).as("s_all"),
            (lit(256L) - col("npresent")).as("v")
          )
          .select(
            col("l_returnflag"),
            col("n_exact"),
            round(
              when(
                // alpha_256 * m^2 * 2^53 / scaled_sum, literals spelled
                // identically in the oracle so the doubles match bit-for-bit
                (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) * lit(9.007199254740992e15) / col("s_all").cast("double")) <= lit(640.0) && col("v") > 0L,
                lit(256.0) * log(lit(256.0) / col("v").cast("double"))
              ).otherwise(
                lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) * lit(9.007199254740992e15) / col("s_all").cast("double")
              ),
              4
            ).as("hll_est")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
             |h AS (SELECT l_returnflag,
             |        ('0x' || substring(md5(cast(l_partkey as varchar)), 1, 15))::bigint AS hv
             |      FROM d),
             |b AS (SELECT l_returnflag, hv >> 52 AS bucket, hv & 4503599627370495 AS w FROM h),
             |r AS (SELECT l_returnflag, bucket,
             |        CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
             |      FROM b),
             |reg AS (SELECT l_returnflag, bucket, max(rho) AS reg, count(1) AS nb
             |        FROM r GROUP BY 1, 2),
             |agg AS (SELECT l_returnflag,
             |          cast(sum(nb) as bigint) AS n_exact,
             |          count(1) AS npresent,
             |          sum((1::bigint << (53 - reg))) AS s_present
             |        FROM reg GROUP BY 1),
             |fin AS (SELECT l_returnflag, n_exact,
             |          cast(s_present + (256 - npresent) * 9007199254740992 as double) AS s_all,
             |          256 - npresent AS v
             |        FROM agg)
             |SELECT l_returnflag, n_exact,
             |  round(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / s_all <= 640.0 AND v > 0
             |             THEN 256.0 * ln(256.0 / cast(v as double))
             |             ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9.007199254740992e15 / s_all END, 4) AS hll_est
             |FROM fin ORDER BY l_returnflag""".stripMargin)
    ),
    QueryDef(
      "q_approx_percentile",
      "approximate percentiles (Pinot PERCENTILETDIGEST ≅ percentile_approx); sketch-dependent values so no SQL oracle — rows-only here, rank-error bound asserted in RelationalSketchSpec; q_percentile_sampled is the oracle-EXACT deterministic-sampling twin",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
            expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95"),
            expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap50_qty")
          )
          .orderBy(col("l_returnflag")),
      None
    ),
    QueryDef(
      "q_kmv_distinct",
      "KMV (k-minimum-values) distinct sketch, the theta-sketch estimator class (Pinot DISTINCTCOUNTTHETASKETCH): mergeable primitive-buffer TypedImperativeAggregate over md5-derived uniform hashes — the estimate is an order statistic of engine-reproducible hashes, so unlike HLL the oracle recomputes it EXACTLY (hash-match, not rows-only)",
      (s, dir) => {
        graft.functions.KmvSketch.register(s)
        // 32-bit md5 prefix as an exact uniform double in [0,1): bit-identical
        // in both engines (q_sample_weighted precedent)
        val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0)
        // hand-rolled two-phase distinct: dedupe (flag, partkey) FIRST, then
        // count + sketch the survivors in ONE mixed aggregate. This is the
        // expansion Catalyst would write for countDistinct anyway — but
        // spelling it out (a) keeps the ObjectHashAggregate out of a
        // multi-phase distinct rewrite (round 5's 3.7s plan: slowest in the
        // suite), and (b) moves the md5 hash AFTER the dedupe, so it runs on
        // ~distinct-keys rows instead of every lineitem row (~10x fewer).
        Tables
          .lineitem(s, dir)
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .select(col("l_returnflag"), h.as("h"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_exact"), expr("kmv_hashes(h, 256)").as("hs"))
          .select(
            col("l_returnflag"),
            col("n_exact"),
            // transcendental-free order statistic: exact hashes in, one IEEE
            // division out — round(4) only as repr insurance
            round(graft.functions.KmvSketch.estimate(col("hs"), 256), 4).as("kmv_est")
          )
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH hashed AS (
             |  SELECT DISTINCT l_returnflag,
             |    ('0x' || substring(md5(cast(l_partkey as varchar)), 1, 8))::bigint / 4294967296.0 AS h
             |  FROM lineitem),
             |ranked AS (
             |  SELECT l_returnflag, h,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
             |    count(1) OVER (PARTITION BY l_returnflag) AS nh
             |  FROM hashed),
             |est AS (
             |  SELECT l_returnflag,
             |    CASE WHEN max(nh) < 256 THEN cast(max(nh) as double)
             |         ELSE 255.0 / max(CASE WHEN rn = 256 THEN h END) END AS kmv_est
             |  FROM ranked GROUP BY l_returnflag),
             |exact AS (
             |  SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT e.l_returnflag, n_exact, round(kmv_est, 4) AS kmv_est
             |FROM exact e JOIN est USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)
    ),
    QueryDef(
      "q_kmv_intersect",
      "KMV theta-sketch SET OPERATION (the capability Pinot ships DISTINCTCOUNTTHETASKETCH for, and that HLL lacks): Jaccard + intersection estimate between two l_returnflag segments' part-key sets, from the merged k-minimum-values sketches — like q_kmv_distinct the result is an order statistic of engine-reproducible md5 hashes, so the oracle hash-matches it exactly",
      (s, dir) => {
        graft.functions.KmvSketch.register(s)
        val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0)
        // dedupe before hashing (q_kmv_distinct's trick): md5 runs on the
        // ~distinct (flag, partkey) pairs, not every matching lineitem row.
        // Both segment sketches come out of ONE global aggregation with
        // per-flag filtered inputs (kmv_hashes skips nulls) — the previous
        // shape filtered two frames off the same unmaterialized groupBy and
        // crossJoined them, running the scan + distinct + sketch TWICE.
        val sk = Tables
          .lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "N"))
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .select(col("l_returnflag"), h.as("h"))
          .agg(
            expr("kmv_hashes(case when l_returnflag = 'A' then h end, 256)").as("hs_a"),
            expr("kmv_hashes(case when l_returnflag = 'N' then h end, 256)").as("hs_b")
          )
        val (jaccard, unionEst, interEst) =
          graft.functions.KmvSketch.intersectColumns(col("hs_a"), col("hs_b"), 256)
        sk.select(
          round(jaccard, 4).as("jaccard_est"),
          round(unionEst, 4).as("union_est"),
          round(interEst, 4).as("intersect_est")
        )
      },
      Some("""WITH hashed AS (
             |  SELECT DISTINCT l_returnflag,
             |    ('0x' || substring(md5(cast(l_partkey as varchar)), 1, 8))::bigint / 4294967296.0 AS h
             |  FROM lineitem WHERE l_returnflag IN ('A', 'N')),
             |topk AS (
             |  SELECT l_returnflag, h FROM (
             |    SELECT l_returnflag, h,
             |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
             |    FROM hashed)
             |  WHERE rn <= 256),
             |u AS (SELECT DISTINCT h FROM topk ORDER BY h LIMIT 256),
             |stats AS (
             |  SELECT count(1) AS nu, max(h) AS hk,
             |    count(1) FILTER (
             |      WHERE h IN (SELECT h FROM topk WHERE l_returnflag = 'A')
             |        AND h IN (SELECT h FROM topk WHERE l_returnflag = 'N')) AS nboth
             |  FROM u),
             |est AS (
             |  SELECT cast(nboth as double) / nu AS jaccard,
             |    CASE WHEN nu < 256 THEN cast(nu as double) ELSE 255.0 / hk END AS union_est
             |  FROM stats)
             |SELECT round(jaccard, 4) AS jaccard_est, round(union_est, 4) AS union_est,
             |  round(jaccard * union_est, 4) AS intersect_est
             |FROM est""".stripMargin)
    ),
    QueryDef(
      "q_kmv_anotb",
      "KMV theta-sketch A-NOT-B (set difference — DataSketches AnotB, the third theta set op Pinot's DISTINCTCOUNTRAWTHETASKETCH exposes): estimates of |A \\ B| and |B \\ A| between the A/N l_returnflag part-key sets from the same merged k-minimum-values sketches as q_kmv_intersect; every union-top-k hash lies below both sketches' retention horizons, so sketch membership decides true membership inside the sample window and the oracle recomputes the identical order statistics",
      (s, dir) => {
        graft.functions.KmvSketch.register(s)
        val h = conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0)
        // same single-aggregation sketch build as q_kmv_intersect: dedupe
        // (flag, partkey) first so md5 runs once per distinct pair, then ONE
        // global agg produces both segment sketches.
        val sk = Tables
          .lineitem(s, dir)
          .filter(col("l_returnflag").isin("A", "N"))
          .select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .select(col("l_returnflag"), h.as("h"))
          .agg(
            expr("kmv_hashes(case when l_returnflag = 'A' then h end, 256)").as("hs_a"),
            expr("kmv_hashes(case when l_returnflag = 'N' then h end, 256)").as("hs_b")
          )
        val (aFrac, aNotB) =
          graft.functions.KmvSketch.aNotBColumns(col("hs_a"), col("hs_b"), 256)
        val (bFrac, bNotA) =
          graft.functions.KmvSketch.aNotBColumns(col("hs_b"), col("hs_a"), 256)
        sk.select(
          round(aFrac, 4).as("a_only_frac"),
          round(aNotB, 4).as("a_not_b_est"),
          round(bFrac, 4).as("b_only_frac"),
          round(bNotA, 4).as("b_not_a_est")
        )
      },
      Some("""WITH hashed AS (
             |  SELECT DISTINCT l_returnflag,
             |    ('0x' || substring(md5(cast(l_partkey as varchar)), 1, 8))::bigint / 4294967296.0 AS h
             |  FROM lineitem WHERE l_returnflag IN ('A', 'N')),
             |topk AS (
             |  SELECT l_returnflag, h FROM (
             |    SELECT l_returnflag, h,
             |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
             |    FROM hashed)
             |  WHERE rn <= 256),
             |u AS (SELECT DISTINCT h FROM topk ORDER BY h LIMIT 256),
             |stats AS (
             |  SELECT count(1) AS nu, max(h) AS hk,
             |    count(1) FILTER (
             |      WHERE h IN (SELECT h FROM topk WHERE l_returnflag = 'A')
             |        AND h NOT IN (SELECT h FROM topk WHERE l_returnflag = 'N')) AS na_only,
             |    count(1) FILTER (
             |      WHERE h IN (SELECT h FROM topk WHERE l_returnflag = 'N')
             |        AND h NOT IN (SELECT h FROM topk WHERE l_returnflag = 'A')) AS nb_only
             |  FROM u),
             |est AS (
             |  SELECT cast(na_only as double) / nu AS a_frac,
             |    cast(nb_only as double) / nu AS b_frac,
             |    CASE WHEN nu < 256 THEN cast(nu as double) ELSE 255.0 / hk END AS union_est
             |  FROM stats)
             |SELECT round(a_frac, 4) AS a_only_frac, round(a_frac * union_est, 4) AS a_not_b_est,
             |  round(b_frac, 4) AS b_only_frac, round(b_frac * union_est, 4) AS b_not_a_est
             |FROM est""".stripMargin)
    ),
    QueryDef(
      "q_cms_join_size",
      "sketch-based JOIN-SIZE estimation (Cormode-Muthukrishnan §4.2, the AGMS use case): |click ⋈ view ON user_id| estimated as the count-min inner product min_d sum_w a[d][w]*b[d][w] — the true join size IS the frequency-vector inner product Σ_u f_click(u)·f_view(u), and collisions only add cross terms, so est >= truth (one-sided, like the point query). The 100 TB use: cardinality statistics for join planning from two O(d·w) sketches built in one pass each, no join executed. Exact join size rides along; both grids use the engine-reproducible sliced-md5 rule, so DuckDB recomputes the identical estimate",
      (s, dir) => {
        graft.functions.CountMinSketch.register(s)
        val depth = 4
        val width = 1024
        def buckets(t: Column) = graft.functions.CountMinSketch.bucketsCol(t, depth, width)
        val ev = Tables
          .events(s, dir)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type"), col("user_id"))
        // both segment sketches out of ONE aggregation over one scan
        // (cms_agg skips the null bucket arrays of the other segment)
        val sks = ev
          .select(col("event_type"), buckets(col("user_id").cast("string")).as("bks"))
          .agg(
            expr(s"cms_agg(case when event_type = 'click' then bks end, $depth, $width)").as("sk_a"),
            expr(s"cms_agg(case when event_type = 'view' then bks end, $depth, $width)").as("sk_b")
          )
        val exact = ev
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("fc"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("fv")
          )
          .agg(sum(col("fc") * col("fv")).cast("long").as("exact_size"))
        sks
          .crossJoin(broadcast(exact)) // two 1-row frames
          .select(
            expr("cms_inner(sk_a, sk_b)").as("est_size"),
            col("exact_size"),
            (expr("cms_inner(sk_a, sk_b)") - col("exact_size")).as("overcount")
          )
      },
      Some("""WITH ev AS (
             |  SELECT event_type, cast(user_id as varchar) AS k
             |  FROM events WHERE event_type IN ('click', 'view')),
             |ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
             |cells AS (
             |  SELECT event_type, d,
             |    ('0x' || substring(md5(k), 1 + 8 * d, 8))::bigint % 1024 AS bkt,
             |    count(1) AS c
             |  FROM ev CROSS JOIN ds GROUP BY 1, 2, 3),
             |prods AS (
             |  SELECT a.d, sum(a.c * b.c) AS s
             |  FROM cells a JOIN cells b
             |    ON a.d = b.d AND a.bkt = b.bkt
             |    AND a.event_type = 'click' AND b.event_type = 'view'
             |  GROUP BY a.d),
             |per_d AS (
             |  SELECT ds.d, coalesce(p.s, 0) AS s FROM ds LEFT JOIN prods p ON ds.d = p.d),
             |est AS (SELECT cast(min(s) as bigint) AS est_size FROM per_d),
             |exact AS (
             |  SELECT cast(sum(fc * fv) as bigint) AS exact_size FROM (
             |    SELECT k,
             |      sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS fc,
             |      sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS fv
             |    FROM ev GROUP BY k))
             |SELECT e.est_size, x.exact_size, e.est_size - x.exact_size AS overcount
             |FROM est e CROSS JOIN exact x""".stripMargin)
    ),
    QueryDef(
      "q_rollup",
      "ROLLUP grouping sets with grouping() indicators",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n"),
            sumDec(col("c_acctbal"), 2).as("sum_bal"),
            grouping(col("n_name")).cast("long").as("g_nation"),
            grouping(col("c_mktsegment")).cast("long").as("g_seg")
          )
          .orderBy(
            col("g_nation"),
            col("g_seg"),
            col("n_name").asc_nulls_first,
            col("c_mktsegment").asc_nulls_first
          ),
      Some(s"""SELECT n_name, c_mktsegment, count(1) AS n,
              |  ${QueryDef.sumDecSql("c_acctbal", 2)} AS sum_bal,
              |  cast(grouping(n_name) as bigint) AS g_nation,
              |  cast(grouping(c_mktsegment) as bigint) AS g_seg
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY ROLLUP(n_name, c_mktsegment)
              |ORDER BY g_nation, g_seg, n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    ),
    QueryDef(
      "q_cube",
      "CUBE grouping sets",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sumDec(col("o_totalprice"), 2).as("sum_price"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio")
          )
          .orderBy(
            col("g_status"),
            col("g_prio"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first
          ),
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(1) AS n,
              |  ${QueryDef.sumDecSql("o_totalprice", 2)} AS sum_price,
              |  cast(grouping(o_orderstatus) as bigint) AS g_status,
              |  cast(grouping(o_orderpriority) as bigint) AS g_prio
              |FROM orders
              |GROUP BY CUBE(o_orderstatus, o_orderpriority)
              |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),
    QueryDef(
      "q_topn",
      "global top-N (Pinot's core selection-order-by shape); Spark plans TakeOrderedAndProject — no global sort",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
    ),
    QueryDef(
      "q_topk_pergroup",
      "per-group top-k via ranking window (single shuffle on the partition key)",
      (s, dir) => {
        val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
        Tables
          .part(s, dir)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, rn, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    row_number() OVER (PARTITION BY p_brand
             |                       ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) t
             |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin)
    ),
    QueryDef(
      "q_window_rank",
      "ranking window functions: rank (ties share), dense_rank, row_number (tiebroken)",
      (s, dir) => {
        val byBal = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc)
        val total = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc, col("s_suppkey"))
        Tables
          .supplier(s, dir)
          .select(
            col("s_nationkey"),
            col("s_suppkey"),
            col("s_acctbal"),
            rank().over(byBal).cast("long").as("rnk"),
            dense_rank().over(byBal).cast("long").as("drnk"),
            row_number().over(total).cast("long").as("rn")
          )
          .orderBy(col("s_nationkey"), col("rn"))
      },
      Some("""SELECT s_nationkey, s_suppkey, s_acctbal,
             |  rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rnk,
             |  dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS drnk,
             |  row_number() OVER (PARTITION BY s_nationkey
             |                     ORDER BY s_acctbal DESC, s_suppkey) AS rn
             |FROM supplier ORDER BY s_nationkey, rn""".stripMargin)
    ),
    QueryDef(
      "q_window_lag",
      "analytic window: lag/lead across a customer's order history",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables
          .orders(s, dir)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("o_totalprice"),
            (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta_prev"),
            lead(col("o_orderkey"), 1).over(w).as("next_order")
          )
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  o_totalprice - lag(o_totalprice, 1) OVER w AS delta_prev,
             |  lead(o_orderkey, 1) OVER w AS next_order
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),
    QueryDef(
      "q_window_framesum",
      "frame-based windows: running decimal sum + 3-row sliding sum (sequential accumulation == exact in both engines)",
      (s, dir) => {
        val w = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        Tables
          .lineitem(s, dir)
          .filter(col("l_suppkey") <= 20)
          .select(
            col("l_suppkey"),
            col("l_orderkey"),
            col("l_linenumber"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double")
              .as("running_qty"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .over(w.rowsBetween(-2, Window.currentRow))
              .cast("double")
              .as("sliding3_qty")
          )
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  cast(cast(sum(cast(l_quantity as decimal(18,2)))
             |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as varchar) as double) AS running_qty,
             |  cast(cast(sum(cast(l_quantity as decimal(18,2)))
             |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as varchar) as double) AS sliding3_qty
             |FROM lineitem WHERE l_suppkey <= 20
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)
    ),
    QueryDef(
      "q_set_union",
      "set op UNION (distinct): nations present among customers or suppliers",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .select(col("c_nationkey").as("nationkey"))
          .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)
    ),
    QueryDef(
      "q_set_intersect",
      "set op INTERSECT: nations with both customers and suppliers",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .select(col("c_nationkey").as("nationkey"))
          .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)
    ),
    QueryDef(
      "q_set_except",
      "set op EXCEPT: nations with customers but no suppliers",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .select(col("c_nationkey").as("nationkey"))
          .except(Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey")),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin)
    ),
    QueryDef(
      "q_string_funcs",
      "scalar string library: lower/upper/length/substring/concat/replace/instr/regexp_extract",
      (s, dir) =>
        Tables
          .part(s, dir)
          .select(
            col("p_partkey"),
            lower(col("p_name")).as("name_lower"),
            upper(col("p_brand")).as("brand_upper"),
            length(col("p_name")).cast("long").as("name_len"),
            substring(col("p_name"), 1, 10).as("name_prefix"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_snake"),
            instr(col("p_name"), "a").cast("long").as("first_a"),
            regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head")
          )
          .orderBy(col("p_partkey"))
          .limit(300),
      Some("""SELECT p_partkey, lower(p_name) AS name_lower, upper(p_brand) AS brand_upper,
             |  length(p_name) AS name_len, substring(p_name, 1, 10) AS name_prefix,
             |  concat(p_brand, '#', p_type) AS brand_type,
             |  replace(p_type, ' ', '_') AS type_snake,
             |  instr(p_name, 'a') AS first_a,
             |  regexp_extract(p_type, '^(\w+)', 1) AS type_head
             |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin)
    ),
    QueryDef(
      "q_date_funcs",
      "scalar date library: year/month/quarter extraction, trunc-to-month, day arithmetic",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .groupBy(
            year(col("o_orderdate")).cast("long").as("o_year"),
            month(col("o_orderdate")).cast("long").as("o_month")
          )
          .agg(
            count(lit(1)).as("n_orders"),
            sumDec(col("o_totalprice"), 2).as("sum_price"),
            min(quarter(col("o_orderdate"))).cast("long").as("q"),
            // string, not date: pandas reads a parquet date as datetime.date
            // ("1995-01-01") but DuckDB's .df() emits datetime64
            // ("1995-01-01 00:00:00") — a date column can't hash-match
            min(col("o_orderdate").cast("date")).cast("string").as("first_date"),
            max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
              .cast("long")
              .as("max_epoch_days")
          )
          .orderBy(col("o_year"), col("o_month")),
      Some(s"""SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
              |  count(1) AS n_orders,
              |  ${QueryDef.sumDecSql("o_totalprice", 2)} AS sum_price,
              |  min(quarter(o_orderdate)) AS q,
              |  cast(min(cast(o_orderdate as date)) as varchar) AS first_date,
              |  max(date_diff('day', DATE '1970-01-01', cast(o_orderdate as date))) AS max_epoch_days
              |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin)
    ),
    QueryDef(
      "q_math_funcs",
      "scalar math library: abs/round/ceil/floor/sqrt/ln/pow (libm-divergent fns rounded to 6)",
      (s, dir) =>
        Tables
          .lineitem(s, dir)
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            abs(col("l_discount") - 0.05).as("abs_disc"),
            // exact decimal arithmetic, not round(x*0.1): a double round at a
            // decimal half diverges between engines (559.545 -> .55 vs .54)
            (col("l_extendedprice").cast("decimal(18,2)") * 10).cast("double").as("price_x10"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            floor(col("l_extendedprice")).as("price_floor"),
            round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
            round(log(col("l_extendedprice")), 6).as("ln_price"),
            round(pow(col("l_discount") + 1.0, 2.0), 6).as("disc_sq")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .limit(500),
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_discount - 0.05) AS abs_disc,
             |  cast(cast(cast(l_extendedprice as decimal(18,2)) * 10 as varchar) as double) AS price_x10,
             |  cast(ceil(l_extendedprice) as bigint) AS price_ceil,
             |  cast(floor(l_extendedprice) as bigint) AS price_floor,
             |  round(sqrt(l_quantity), 6) AS sqrt_qty,
             |  round(ln(l_extendedprice), 6) AS ln_price,
             |  round(pow(l_discount + 1.0, 2.0), 6) AS disc_sq
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin)
    )
  )
}
