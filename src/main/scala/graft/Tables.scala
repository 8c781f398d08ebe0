package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture loaders + session construction shared by Verify / Bench / tests.
  *
  * All query entry points receive `(spark, sfDir)` and load parquet through
  * here so scan-level concerns (the nanosecond-timestamp workaround, column
  * pruning) live in one place.
  */
object Tables {

  /** Confs every graft session needs. Applied both at builder time (Verify /
    * Bench / tests) and defensively at runtime (all are dynamic SQLConfs).
    *
    * - `nanosAsLong`: some generations of the `events` fixture store `ts`
    *   as parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    *   ([PARQUET_TYPE_ILLEGAL]); reading it as a long and converting in
    *   [[events]] keeps the scan vectorized. Harmless when the fixture is
    *   micros — [[events]] adapts to whichever type the scan surfaces.
    * - AQE on: at 100 TB, runtime coalescing / skew-join splitting matter
    *   far more than any static tuning we could do here.
    */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC"
  )

  def applyConfs(spark: SparkSession): Unit =
    sessionConfs.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: Throwable => () }
    }

  /** Build a local session with graft confs. `cpus` also sizes
    * `spark.sql.shuffle.partitions` — on a real cluster this would instead
    * be ~2-3x total executor cores (or left to AQE's initial value).
    */
  def localSession(appName: String, cpus: String = "4"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
      .config("spark.ui.enabled", "false")
      // catalog-level native functions (kmv_*, bloom_*, redact_pii, ...):
      // the same injection a cluster deployment gets from
      // spark.sql.extensions=graft.GraftExtensions; per-session register()
      // helpers remain available and keep the identical builders
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Disable the build-once artifact caches (dedup signatures, IVF index):
    * set GRAFT_NO_ARTIFACT_CACHE=1 to keep full lineage in every query —
    * used by scripts/gen_plans.sh so PLANS.md shows the real pipelines
    * instead of checkpoint scans.
    */
  lazy val noArtifactCache: Boolean =
    sys.env.get("GRAFT_NO_ARTIFACT_CACHE").exists(_.nonEmpty)

  /** Durable root for build-once artifacts (dedup signatures/pairs, IVF
    * assignments/centroids). Unset (the bench default) keeps artifacts as
    * session-scoped `localCheckpoint` blocks — fast, but an executor loss
    * fails later reuses. Set `-Dgraft.artifact.root=...` (or
    * GRAFT_ARTIFACT_ROOT) to route builds through the [[graft.sources.Sinks]]
    * layouts onto durable storage instead: first use writes the artifact
    * (partition-pruned / range-clustered parquet), every later use — in
    * this session or any other — reads it back. A `def`, not a lazy val,
    * so tests (and long-lived services) can redirect the root at runtime.
    */
  def artifactRoot: Option[String] =
    sys.props.get("graft.artifact.root").orElse(sys.env.get("GRAFT_ARTIFACT_ROOT")).filter(_.nonEmpty)

  /** Filesystem-safe key for an sfDir used under [[artifactRoot]]. The
    * sanitized form alone can collide ("/a/b" and "/a_b" both sanitize to
    * "_a_b" — under a shared root the cache would then silently serve one
    * dataset's signatures for another), so the raw string's hash is
    * appended to make distinct dirs distinct keys.
    */
  def artifactDirKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))

  /** Rebalance a small pre-explode frame across the cluster before a
    * compute-heavy fan-out stage (shingle/token/component explode feeding
    * hashing or decimal aggregation).
    *
    * Parquet scan parallelism is bounded by row-group count; the fixtures
    * are single-row-group files, so without this every post-scan pipeline
    * runs as ONE task (measured: the whole dedup/IVF family serialized on
    * one core). That reasoning INVERTS at corpus scale: a 100 TB input's
    * scan already yields thousands of splits, and an unconditional
    * repartition would shuffle the whole corpus (text column included)
    * for nothing. So the behavior is mode-gated via
    * `spark.graft.fanout.mode`:
    *   - "force": always repartition — the local/fixture default
    *     (single-JVM master), zero extra planning cost.
    *   - "auto":  repartition only when the physical scan is starved
    *     (fewer partitions than defaultParallelism) — the cluster
    *     default; costs one physical-plan pass to inspect.
    *   - "off":   no-op, for deployments that pre-size their scans.
    * Round-robin repartition local-sorts for retry determinism
    * (SPARK-23207), so plans stay correct under stage recomputation.
    */
  def fanout(df: DataFrame): DataFrame = {
    val sp   = df.sparkSession
    val sc   = sp.sparkContext
    val mode = sp.conf.get("spark.graft.fanout.mode", if (sc.isLocal) "force" else "auto")
    mode match {
      case "off"   => df
      case "force" => df.repartition(sc.defaultParallelism)
      case _ =>
        if (df.rdd.getNumPartitions >= sc.defaultParallelism) df
        else df.repartition(sc.defaultParallelism)
    }
  }

  /** Keyed [[fanout]]: repartition by `keys` into the session's configured
    * shuffle-partition count — the SAME exchange a downstream
    * groupBy/distinct on those keys would create, minus AQE's byte-based
    * coalescing. For compute-dense post-shuffle stages (tokenizer encode
    * folds, Viterbi DP) AQE's coalescing is exactly wrong: it sizes the
    * stage by shuffle BYTES, but these stages cost per ROW of compute, so
    * a few-MB frame collapses to ONE task carrying seconds of work
    * (measured r20: q_unigram_encode ran its whole DP in a single 1.6 s
    * task). Because the downstream aggregation reuses this partitioning,
    * the exchange count is UNCHANGED — this only pins the reducer count
    * where AQE would have collapsed it. Mode-gated like [[fanout]]
    * ("off" disables); at cluster data volumes the exchange this replaces
    * would not have been coalesced anyway, so the plan is identical.
    */
  def fanoutBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val sp   = df.sparkSession
    val mode = sp.conf.get("spark.graft.fanout.mode", if (sp.sparkContext.isLocal) "force" else "auto")
    if (mode == "off") df
    else {
      val n = sp.conf.get("spark.sql.shuffle.partitions", "200").toInt
      df.repartition(n, keys: _*)
    }
  }

  /** Materialize a frame that multiple downstream consumers (or an
    * iterative loop) will re-read, exactly once. Mode-gated via
    * `spark.graft.pin.mode` because the right mechanism differs by
    * deployment:
    *   - "local" (default on a local master): eager `localCheckpoint` —
    *     fastest, but the blocks live on executors ONLY and lineage is
    *     truncated, so one lost executor fails every later reuse. Right
    *     for single-JVM bench/test runs, wrong on preemptible clusters.
    *   - "persist" (default otherwise): `persist(DISK_ONLY)` + eager
    *     materialization. Lineage is KEPT — a lost executor's blocks
    *     recompute from source instead of failing the job. DISK_ONLY so
    *     the pinned frame never competes with shuffle/exec memory.
    *   - "reliable": eager `checkpoint()` to the session's checkpoint dir
    *     (shared storage) — survives executor loss without recompute;
    *     requires `sparkContext.setCheckpointDir` on durable storage.
    */
  def pin(df: DataFrame): DataFrame = {
    val sp   = df.sparkSession
    val mode = sp.conf.get("spark.graft.pin.mode", if (sp.sparkContext.isLocal) "local" else "persist")
    mode match {
      case "reliable" => df.checkpoint()
      case "persist" =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        p.count() // eager: consumers must share ONE materialization
        p
      case _ => df.localCheckpoint()
    }
  }

  /** [[pin]] for ITERATIVE loops (pointer doubling, Lloyd iterations):
    * these must TRUNCATE lineage every round — a lineage-retaining persist
    * doubles the logical plan per self-joining round (round k carries 2^k
    * copies of round 0's tree; measured: analyzer OOM within ~8 rounds of
    * the CC loop), so "persist" mode is structurally wrong here no matter
    * how fault-tolerant it is. Cluster modes therefore route to a RELIABLE
    * `checkpoint()` when a checkpoint dir is configured (shared-storage
    * truncation: survives executor loss), falling back to
    * `localCheckpoint` — the fast, non-reliable truncation — when not.
    */
  def pinIter(df: DataFrame): DataFrame = {
    val sp   = df.sparkSession
    val sc   = sp.sparkContext
    val mode = sp.conf.get("spark.graft.pin.mode", if (sc.isLocal) "local" else "persist")
    if (mode != "local" && sc.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
  }

  /** Chainable syntax for [[pin]]/[[pinIter]]:
    * `df.groupBy(...).agg(...).pin()`.
    */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame     = Tables.pin(df)
    def pinIter(): DataFrame = Tables.pinIter(df)
  }

  /** Release a [[pin]]/[[pinIter]]ned frame's storage — handles all three
    * mechanisms: localCheckpoint/checkpoint frames expose a `LogicalRDD`
    * (blocks unpersisted; for a RELIABLE checkpoint the materialized files
    * are deleted too — Spark's own cleaner only reclaims them at context
    * shutdown unless `cleanCheckpoints` is set, so an iterative loop would
    * otherwise stack one full frame copy per round on shared storage), and
    * persisted frames unpersist through the Dataset. Safe only once every
    * consumer has either finished or been eagerly pinned itself.
    */
  def unpin(df: DataFrame): Unit = {
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile.foreach { dir =>
          try {
            val p  = new org.apache.hadoop.fs.Path(dir)
            val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(p, true)
          } catch { case scala.util.control.NonFatal(_) => () } // best-effort reclaim
        }
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
    df.unpersist(blocking = false)
  }

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** One resolved relation per (session, dir, table) — `spark.read.parquet`
    * re-infers the schema (a footer read) and rebuilds the relation on
    * every call, which measured as THE dominant share of the per-query
    * planning floor (~300ms -> ~36ms to plan the star join once reads are
    * reused). A catalog would resolve a table once for the same reason;
    * this is that, for the fixture loaders. Safe because the fixture dirs
    * are immutable inputs and DataFrames are immutable plan handles
    * (self-joins of a shared instance go through Spark's
    * DeduplicateRelations like any `df.join(df)`).
    */
  private val readCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    applyConfs(spark)
    // evict entries owned by stopped sessions: a long-lived JVM cycling
    // sessions would otherwise retain every dead session (and its resolved
    // relations) for the process lifetime
    readCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    readCache.computeIfAbsent((spark, dir, name), _ => spark.read.parquet(path(dir, name)))
  }

  // TPC-H-ish star schema (FIXTURES.md §B)
  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")

  // LLM-pipeline tables
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** All fixture tables by name — the catalog the SQL surface registers. */
  val tableNames: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view so the whole engine is
    * reachable from `spark.sql(...)` — the API Pinot users actually speak.
    * Combined with [[graft.GraftExtensions]] (native function injection)
    * this makes plain SQL a first-class entry point: the same Catalyst
    * plans as the DataFrame surface, including the ns-timestamp handling
    * for `events` (views go through the same readers).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      val df = n match {
        case "events" => events(spark, dir)
        case other    => read(spark, dir, other)
      }
      df.createOrReplaceTempView(n)
    }

  /** The event-stream table (the stand-in for the reference's Pulsar topic).
    *
    * `ts` adapts to the fixture's PHYSICAL type — the same logical instant
    * has two legal parquet encodings and the fixtures have shipped both:
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it natively
    *     ([PARQUET_TYPE_ILLEGAL]); with `nanosAsLong=true` it arrives as
    *     LONG nanos and is converted with integer arithmetic — `ts div
    *     1000` stays in long space (a double division would lose precision
    *     above 2^53 and corrupt microseconds).
    *   - TIMESTAMP(MICROS) without timezone: arrives as TIMESTAMP_NTZ;
    *     cast to TIMESTAMP under the UTC session zone (a field-identity
    *     cast) so downstream `unix_timestamp` emission matches DuckDB's
    *     `epoch(ts)`, which reads the same naive value as UTC.
    *
    * Hard-coding either branch makes the whole events family fail analysis
    * on the other encoding (round-9 postmortem); the reference's decoder
    * is likewise tolerant of whatever the wire value parses as
    * (PulsarJSONMessageDecoder.java:61-73). [[graft.sources.TsParitySpec]]
    * pins NTZ→UTC epoch parity incl. DST-spanning and pre-1970 instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other (expected LONG nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }
}
