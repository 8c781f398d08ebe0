package graft.operators

import graft.{QueryDef, Tables}
import graft.sources.JsonDecode
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The event-stream surface: what the reference's ingestion feed exists to
  * serve (SURVEY §2.2 streaming rows + §3.1 decode path), as batch queries
  * over the `events` fixture. Each streaming construct has a batch twin here
  * (DuckDB can't run streaming queries — SURVEY §7.5.4); the streaming forms
  * themselves (watermarks, MemoryStream, checkpoint restart) are exercised
  * in `graft.streaming` scalatest suites.
  *
  * Event timestamps are emitted as epoch seconds (long): the fixture's ts is
  * ns-precision parquet, and a long sidesteps Spark-µs/DuckDB-ns unit
  * differences in the driver's hash compare.
  *
  * Scale: all window/session queries shuffle once on their grouping key;
  * session windows additionally sort within partitions (Spark plans
  * UpdatingSessionsExec) — state stays bounded per user, the 100 TB story
  * is a straight groupBy-shuffle, no driver-side anything.
  */
object Events {

  // events.value is clean 2-decimal in the fixtures (verified: value*100 is
  // integral corpus-wide), so the scaled-long fast path is bit-identical to
  // the decimal cast with no per-row BigDecimal (QueryDef.sumScaled scaladoc)
  private def sumDec(c: Column, scale: Int = 4): Column =
    QueryDef.sumScaled(c, scale)

  /** props payload schema — the host-supplied `fieldsToRead` of the decode
    * seam (`PulsarJSONMessageDecoder.java:48`).
    */
  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_json_get",
      "S13 JSON field extraction per message (Pinot JSONEXTRACTSCALAR ≅ get_json_object)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(
            col("event_id"),
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val")
          )
          .orderBy(col("event_id"))
          .limit(500),
      Some("""SELECT event_id, event_type,
             |  cast(json_extract_string(props, '$.k') as bigint) AS k_val
             |FROM events ORDER BY event_id LIMIT 500""".stripMargin)
    ),
    QueryDef(
      "q_json_decode_agg",
      "S13-S15 full decode path: from_json (PERMISSIVE, drop-on-malformed) + projection, then aggregate",
      (s, dir) => {
        val decoded = JsonDecode.decode(
          Tables.events(s, dir),
          payloadCol = "props",
          schema = propsSchema,
          fields = Seq("k"),
          passthrough = Seq("event_type")
        )
        decoded
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            (sum(col("k")).cast("double") / count(lit(1))).as("avg_k")
          )
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(1) AS n,
             |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS sum_k,
             |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as double)
             |    / count(1) AS avg_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    QueryDef(
      "q_json_variant",
      "Spark-4 VARIANT decode path: try_parse_json ONCE into the binary variant encoding, then typed variant_get extraction — at 100 TB this replaces per-call-site string re-parsing (get_json_object re-parses the JSON text at every extraction; variant parses once and each access is a binary traversal, with shredded-column pushdown on variant-aware scans). try_parse_json (not strict parse_json) nulls out a malformed document instead of failing the query, and the malformed count is reported alongside missing keys — the full drop-on-malformed accounting the reference decoder keeps (PulsarJSONMessageDecoder.java:61-73)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(col("event_type"), expr("try_parse_json(props)").as("v"))
          .select(
            col("event_type"),
            expr("variant_get(v, '$.k', 'bigint')").as("k_val"),
            col("v").isNull.cast("long").as("malformed")
          )
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("k_val")).as("sum_k"),
            min(col("k_val")).as("min_k"),
            max(col("k_val")).as("max_k"),
            sum(col("k_val").isNull.cast("long")).as("n_missing"),
            sum(col("malformed")).as("n_malformed")
          )
          .orderBy(col("event_type")),
      Some("""WITH v AS (
             |  SELECT event_type,
             |    CASE WHEN json_valid(props)
             |         THEN cast(json_extract_string(props, '$.k') as bigint) END AS k,
             |    CASE WHEN coalesce(json_valid(props), FALSE) THEN 0 ELSE 1 END AS malformed
             |  FROM events)
             |SELECT event_type, count(1) AS n,
             |  cast(sum(k) as bigint) AS sum_k,
             |  cast(min(k) as bigint) AS min_k,
             |  cast(max(k) as bigint) AS max_k,
             |  cast(sum(cast(k IS NULL as bigint)) as bigint) AS n_missing,
             |  cast(sum(malformed) as bigint) AS n_malformed
             |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    QueryDef(
      "q_event_window_tumbling",
      "tumbling event-time window (batch twin of the streaming windowed agg)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sumDec(col("value"), 2).as("sum_value")
          )
          .select(
            unix_timestamp(col("window.start")).as("wstart_s"),
            col("event_type"),
            col("n"),
            col("sum_value")
          )
          .orderBy(col("wstart_s"), col("event_type")),
      Some(s"""SELECT cast(floor(epoch(ts) / 3600) * 3600 as bigint) AS wstart_s,
              |  event_type, count(1) AS n,
              |  ${QueryDef.sumDecSql("\"value\"", 2)} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY wstart_s, event_type""".stripMargin)
    ),
    QueryDef(
      "q_event_window_sliding",
      "sliding event-time window (1h window / 30min slide; each event lands in exactly 2 windows)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), sumDec(col("value"), 2).as("sum_value"))
          .select(
            unix_timestamp(col("window.start")).as("wstart_s"),
            col("n"),
            col("sum_value")
          )
          .orderBy(col("wstart_s")),
      Some(s"""SELECT cast(floor(epoch(ts) / 1800) * 1800 - 1800 * i as bigint) AS wstart_s,
              |  count(1) AS n,
              |  ${QueryDef.sumDecSql("\"value\"", 2)} AS sum_value
              |FROM events CROSS JOIN (VALUES (0), (1)) s(i)
              |GROUP BY 1 ORDER BY wstart_s""".stripMargin)
    ),
    QueryDef(
      "q_event_session",
      "session windows per user, 30-minute gap (batch twin of session_window; oracle = gaps-and-islands)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n"), sumDec(col("value"), 2).as("sum_value"))
          .select(
            col("user_id"),
            unix_timestamp(col("session_window.start")).as("session_start_s"),
            (unix_timestamp(col("session_window.end"))).as("session_end_s"),
            col("n"),
            col("sum_value")
          )
          .orderBy(col("user_id"), col("session_start_s")),
      Some(s"""WITH flagged AS (
              |  SELECT user_id, ts, "value",
              |    CASE WHEN lag(ts) OVER w IS NULL
              |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              |         THEN 1 ELSE 0 END AS new_session
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
              |), sessions AS (
              |  SELECT user_id, ts, "value",
              |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
              |                           ROWS UNBOUNDED PRECEDING) AS session_id
              |  FROM flagged
              |)
              |SELECT user_id,
              |  cast(floor(epoch(min(ts))) as bigint) AS session_start_s,
              |  cast(floor(epoch(max(ts))) + 1800 as bigint) AS session_end_s,
              |  count(1) AS n,
              |  ${QueryDef.sumDecSql("\"value\"", 2)} AS sum_value
              |FROM sessions GROUP BY user_id, session_id
              |ORDER BY user_id, session_start_s""".stripMargin)
    ),
    QueryDef(
      "q_event_compacted",
      "S7 readCompacted semantics: latest value per key at read time (event_id is the monotone offset)",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
        Tables
          .events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"),
            col("event_id"),
            col("event_type"),
            col("value"),
            unix_timestamp(col("ts")).as("ts_s")
          )
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type, "value",
             |  cast(floor(epoch(ts)) as bigint) AS ts_s
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY user_id
             |                               ORDER BY event_id DESC) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)
    ),
    QueryDef(
      "q_event_transitions",
      "per-user behavioral transition matrix (first-order Markov census): each user's event stream ordered by (ts, event_type, event_id) — the type tiebreak matches the streaming twin, which has no event_id; events tying on both ts and type are interchangeable for the matrix, so the order is deterministic in effect — every adjacent (type -> next type) step counted corpus-wide, with the row-conditional probability p = n / sum(n per from_type) — the session-model / next-event-prediction baseline and the input a funnel designer reads to find the real paths. Scale shape: ONE user-keyed shuffle for the lead() window (users are independent, so the window never sees more than one user's rows), then the census aggregates T^2 cells — the matrix side is constant-size, and the probability join touches only those cells",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_type"), col("event_id"))
        val steps = Tables
          .events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        // row totals via a window over the T^2-row census, NOT a self-join:
        // referencing `steps` twice re-plans its whole subtree — a second
        // events scan and a second user-keyed lead window (the
        // referenced-twice-aggregate trap, SCALE.md) — while the window
        // re-partitions only the constant-size matrix
        val wt = Window.partitionBy(col("from_type"))
        steps
          .select(
            col("from_type"),
            col("to_type"),
            col("n"),
            round(col("n") / sum(col("n")).over(wt), 6).as("p")
          )
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id) AS next_type
             |  FROM events),
             |m AS (
             |  SELECT event_type AS from_type, next_type AS to_type, count(1) AS n
             |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, cast(sum(n) as bigint) AS tot FROM m GROUP BY 1)
             |SELECT m.from_type, m.to_type, m.n, round(m.n / t.tot, 6) AS p
             |FROM m JOIN t USING (from_type) ORDER BY 1, 2""".stripMargin)
    ),
    QueryDef(
      "q_event_type_stats",
      "per-type stats incl. stddev/variance (rounded: parallel-aggregation order differs)",
      (s, dir) =>
        Tables
          .events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("value")).as("min_v"),
            max(col("value")).as("max_v"),
            round(stddev_samp(col("value")), 4).as("sd_v"),
            round(var_samp(col("value")), 3).as("var_v")
          )
          .orderBy(col("event_type")),
      Some("""SELECT event_type, count(1) AS n, count(DISTINCT user_id) AS n_users,
             |  min("value") AS min_v, max("value") AS max_v,
             |  round(stddev_samp("value"), 4) AS sd_v,
             |  round(var_samp("value"), 3) AS var_v
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    QueryDef(
      "q_event_rangeframe",
      "value-RANGE window frame: per-row trailing-1-hour rolling sum (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over epoch seconds), reduced to the peak rolling revenue per event type. Rolling sums are exact decimals so the per-row values — and therefore the max — are engine-identical",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("event_type"))
          .orderBy(col("ts_s"))
          .rangeBetween(-3600L, 0L)
        Tables
          .events(s, dir)
          .select(col("event_type"), unix_timestamp(col("ts")).as("ts_s"), col("value"))
          // scaled-long rolling sum: the sliding frame REBUILDS its buffer
          // whenever rows age out (no retraction in WindowExec), so per-add
          // cost is paid frame-width times per row — long adds instead of
          // decimal adds, bit-identical for clean 2-decimal values, one
          // exact decimal conversion after the max (QueryDef.sumScaled)
          .withColumn("rolling", sum(floor(col("value") * lit(1e4) + lit(0.5))).over(w))
          .groupBy(col("event_type"))
          .agg(
            (max(col("rolling")).cast("decimal(38,0)") *
              lit(java.math.BigDecimal.ONE.movePointLeft(4))).cast("double").as("peak_1h_sum"),
            count(lit(1)).as("n_events")
          )
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  cast(cast(max(rolling) as varchar) as double) AS peak_1h_sum,
             |  count(1) AS n_events
             |FROM (
             |  SELECT event_type,
             |    sum(cast("value" as decimal(18,4))) OVER (
             |      PARTITION BY event_type ORDER BY cast(floor(epoch(ts)) as bigint)
             |      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS rolling
             |  FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    QueryDef(
      "q_event_anomaly",
      "event-rate anomaly detection: hourly counts per type, z-score of each window against that type's own rate distribution, flag |z| >= 2. Variance is computed from exact integer sums (n*s2 - s1^2 over n^2) so mean/std/z are single correctly-rounded IEEE ops — bit-identical across engines; per-type stats come from a whole-partition window over the tiny counts frame (ONE events scan — a join back onto counts would re-derive the aggregation lineage and scan the fact table twice)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val counts = Tables
          .events(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .select(unix_timestamp(col("window.start")).as("wstart_s"), col("event_type"), col("c"))
        val w   = Window.partitionBy(col("event_type"))
        val nW  = count(lit(1)).over(w)
        val s1  = sum(col("c")).over(w)
        val s2  = sum(col("c") * col("c")).over(w)
        val std = sqrt((nW * s2 - s1 * s1).cast("double") / (nW * nW))
        counts
          .withColumn("ok", nW * s2 - s1 * s1 > 0)
          .withColumn("z", (col("c") - s1.cast("double") / nW) / std)
          .filter(col("ok") && abs(col("z")) >= 2.0)
          .select(col("event_type"), col("wstart_s"), col("c"), col("z"))
          .orderBy(col("event_type"), col("wstart_s"))
      },
      Some("""WITH counts AS (
             |  SELECT cast(floor(epoch(ts) / 3600) * 3600 as bigint) AS wstart_s,
             |    event_type, count(1) AS c
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, count(1) AS n_w,
             |    cast(sum(c) as bigint) AS s1, cast(sum(c * c) as bigint) AS s2
             |  FROM counts GROUP BY 1
             |  HAVING count(1) * cast(sum(c * c) as bigint)
             |       - cast(sum(c) as bigint) * cast(sum(c) as bigint) > 0)
             |SELECT event_type, wstart_s, c,
             |  (c - cast(s1 as double) / n_w)
             |    / sqrt(cast(n_w * s2 - s1 * s1 as double) / (n_w * n_w)) AS z
             |FROM counts JOIN stats USING (event_type)
             |WHERE abs((c - cast(s1 as double) / n_w)
             |    / sqrt(cast(n_w * s2 - s1 * s1 as double) / (n_w * n_w))) >= 2.0
             |ORDER BY event_type, wstart_s""".stripMargin)
    ),
    QueryDef(
      "q_event_gap_hist",
      "per-user inter-arrival gap histogram in log2 second buckets — the sessionization-threshold calibration readout: q_event_session hard-codes a 30-minute gap, and THIS distribution (is there a valley between the within-session and between-session modes?) is what justifies or re-tunes it. Gap = consecutive same-user epoch-second difference (one user-partitioned lag window — hash-partitioned by user_id, the gap multiset is invariant under equal-timestamp permutations so ORDER BY t alone is deterministic); bucket = floor(log2(gap)) computed EXACTLY as length(bin(gap)) - 1 (a string length of the binary representation — identical in both engines, no transcendental log to disagree on), with zero-second gaps in bucket -1. Output per bucket: gap count, min and max gap — all exact bigints",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
        Tables
          .events(s, dir)
          .select(col("user_id"), unix_timestamp(col("ts")).as("t"))
          .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(
            when(col("gap") === 0, lit(-1L))
              .otherwise((length(bin(col("gap"))) - 1).cast("long")).as("bucket"),
            col("gap")
          )
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("n_gaps"),
            min(col("gap")).as("min_gap"),
            max(col("gap")).as("max_gap")
          )
          .orderBy(col("bucket"))
      },
      Some("""WITH g0 AS (
             |  SELECT user_id, cast(floor(epoch(ts)) as bigint) AS t FROM events),
             |g1 AS (
             |  SELECT t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap FROM g0),
             |g2 AS (
             |  SELECT CASE WHEN gap = 0 THEN -1
             |              ELSE length(bin(gap)) - 1 END AS bucket, gap
             |  FROM g1 WHERE gap IS NOT NULL)
             |SELECT cast(bucket as bigint) AS bucket, cast(count(1) as bigint) AS n_gaps,
             |  cast(min(gap) as bigint) AS min_gap, cast(max(gap) as bigint) AS max_gap
             |FROM g2 GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    QueryDef(
      "q_event_funnel",
      "ordered-step conversion FUNNEL (signup -> view -> click -> purchase): a user converts step k iff the step's event occurs STRICTLY AFTER their first step-(k-1) conversion time — min-ts chaining, the product-analytics funnel semantics (unordered presence would count a purchase that preceded the signup). Scale shape: one pinned (user, type, ts) projection feeds a chain of user-keyed filter -> min aggregations, one join per step on the SHRINKING converted-user set — never a per-user sort or a T-way self-join of the raw stream; the final window ranks a 4-row frame. Output per step: users reached, conversion from the top and from the previous step (one IEEE division of exact counts, emitted raw like dup_frac)",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val steps = Seq("signup", "view", "click", "purchase")
        val ev = Tables
          .events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"))
        // s_k = per-user earliest step-k event strictly after their s_{k-1}
        val stage0 = ev
          .filter(col("event_type") === steps.head)
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("t"))
        val stages = steps.tail.scanLeft(stage0) { (prev, step) =>
          ev.filter(col("event_type") === step)
            .join(prev.select(col("user_id"), col("t").as("pt")), Seq("user_id"))
            .filter(col("ts") > col("pt"))
            .groupBy(col("user_id"))
            .agg(min(col("ts")).as("t"))
        }
        val counts = stages
          .zip(steps)
          .zipWithIndex
          .map { case ((st, name), i) =>
            st.agg(count(lit(1)).as("users"))
              .select(lit((i + 1).toLong).as("step"), lit(name).as("event_type"), col("users"))
          }
          .reduce(_ unionByName _)
        val w = Window.orderBy(col("step"))
        counts
          .select(
            col("step"),
            col("event_type"),
            col("users"),
            (col("users").cast("double") /
              first(col("users")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
              .as("conv_from_top"),
            (col("users").cast("double") /
              coalesce(lag(col("users"), 1).over(w), col("users")).cast("double"))
              .as("conv_from_prev")
          )
          .orderBy(col("step"))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON s1.user_id = e.user_id
             |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON s2.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
             |s4 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 ON s3.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
             |c AS (
             |  SELECT cast(1 as bigint) AS step, 'signup' AS event_type, cast(count(1) as bigint) AS users FROM s1
             |  UNION ALL SELECT 2, 'view', count(1) FROM s2
             |  UNION ALL SELECT 3, 'click', count(1) FROM s3
             |  UNION ALL SELECT 4, 'purchase', count(1) FROM s4)
             |SELECT step, event_type, users,
             |  cast(users as double)
             |    / cast(first_value(users) OVER (ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS conv_from_top,
             |  cast(users as double)
             |    / cast(coalesce(lag(users) OVER (ORDER BY step), users) as double) AS conv_from_prev
             |FROM c ORDER BY step""".stripMargin)
    )
  )
}
