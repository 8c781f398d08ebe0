package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once artifact plumbing shared by the operator families that ship
  * reusable tables (graph edge lists / PageRank / TrustRank scores, the BPE
  * merge table): session-scoped [[Tables.pin]] by default, durable
  * range-sorted parquet under `graft.artifact.root` (root in the cache key:
  * redirecting it rebuilds), with the build run's observe() counters
  * persisted as `_metrics.json` next to `_SUCCESS` so the no-silent-caps
  * metrics survive durable reuse runs (which read parquet back and execute
  * no observed plan).
  */
object Artifacts {

  /** On-disk FORMAT VERSION of the durable artifacts, encoded in every
    * artifact's path (`.../<name>/fv=N`). Bump it whenever any builder's
    * output FORMULA or layout changes (the r15 teleport-constant fix is the
    * motivating case: it changed the graph_pagerank/graph_trustrank score
    * tables while the path stayed identical, so a deployment pointing
    * `graft.artifact.root` at a root populated by the previous build would
    * silently serve stale old-formula tables — the parity specs always use
    * a fresh temp root and can never catch that). With the version in the
    * path, a formula change makes old roots a cache MISS: the artifact is
    * rebuilt under the new `fv=` directory instead of replayed stale.
    * v3: the graph traversal family re-based on ONE settled σ frame —
    * `graph_sigma` now holds the (seed, node, d, sig) frame (previously
    * the path-count census, now `graph_pathcounts`), `graph_msbfs` is
    * gone (subsumed), and the σ per-level sum runs in decimal before its
    * clamp.
    */
  private[graft] val FormatVersion = 3

  /** The durable on-disk location of one build-once artifact: root /
    * sanitized-input-dir / artifact-name / format-version. Shared by every
    * artifact family (dedup signatures, IVF/PQ index, graph scores, BPE
    * merges) so the [[FormatVersion]] invalidation rule is uniform.
    */
  private[graft] def durablePath(root: String, dir: String, name: String): String =
    s"$root/${Tables.artifactDirKey(dir)}/$name/fv=$FormatVersion"

  /** Materialize a TRACKED builder outside the artifact caches — the
    * `Tables.noArtifactCache` full-rebuild path: pin the result, reclaim
    * the builder's pinned intermediates (mirroring [[cachedInTracked]]'s
    * session path). Without this the no-cache mode leaks every
    * invocation's checkpoint generations for the session lifetime.
    */
  private[graft] def materializeTracked(build: => (DataFrame, Seq[DataFrame])): DataFrame = {
    val (frame, pins) = build
    val pinned        = Tables.pin(frame)
    pins.foreach(Tables.unpin)
    pinned
  }

  /** [[cachedIn]] whose build also RETURNS the intermediate frames it
    * pinned: once the artifact is materialized (session pin or durable
    * parquet), those builder pins have no further consumer and are
    * reclaimed here — without this every artifact build leaks its loop's
    * checkpoint generations for the session lifetime (the tracked-pins
    * discipline [[graft.streaming.StreamingGraph]] applies per fold).
    */
  private[graft] def cachedInTracked(
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession,
      dir: String,
      name: String,
      sortKey: String
  )(build: => (DataFrame, Seq[DataFrame])): DataFrame = {
    val root = Tables.artifactRoot
    val key  = (s, s"$dir|${root.getOrElse("")}")
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    Option(cache.get(key)).getOrElse {
      val built = root match {
        case Some(r) =>
          val path = durablePath(r, dir, name)
          graft.sources.Sinks.durableArtifact(s, path) { p =>
            // persist the build's observe() counters next to _SUCCESS (the
            // Dedup cache discipline): reuse runs serve the parquet
            // read-back, which carries no observed metrics — without this
            // a capped build would be invisible exactly in durable mode
            val (frame, pins) = build
            val metricNames = frame.queryExecution.analyzed.collect {
              case m: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => m.name
            }.toSet
            val metrics = graft.sources.Sinks.captureObservedMetrics(s, metricNames) {
              graft.sources.Sinks.writeRangeSorted(frame, p, sortKey, 4)
            }
            if (metrics.nonEmpty) graft.sources.Sinks.writeMetricsJson(s, p, metrics)
            pins.foreach(Tables.unpin)
          }
        case None =>
          val (frame, pins) = build
          val pinned = Tables.pin(frame)
          pins.foreach(Tables.unpin)
          pinned
      }
      Option(cache.putIfAbsent(key, built)).getOrElse(built)
    }
  }

  /** Build-once artifact: session-scoped pin by default, durable
    * range-sorted parquet under `graft.artifact.root`.
    */
  private[graft] def cachedIn(
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession,
      dir: String,
      name: String,
      sortKey: String
  )(build: => DataFrame): DataFrame =
    cachedInTracked(cache, s, dir, name, sortKey)((build, Seq.empty))

  /** [[cachedIn]] for a builder whose result frame arrives ALREADY pinned
    * (an iterative loop's settled pinIter frame): the session path caches
    * the frame as-is — re-materializing a second copy just to transfer pin
    * ownership would double-write a node-sized table — while the durable
    * path writes from the pinned blocks and reclaims the pin afterwards
    * (the tracked form with the frame as its own pin).
    */
  private[graft] def cachedPrePinned(
      cache: java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame],
      s: SparkSession,
      dir: String,
      name: String,
      sortKey: String
  )(build: => DataFrame): DataFrame =
    if (Tables.artifactRoot.isDefined)
      cachedInTracked(cache, s, dir, name, sortKey) { val f = build; (f, Seq(f)) }
    else {
      val key = (s, s"$dir|")
      cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
      Option(cache.get(key)).getOrElse {
        val f = build
        Option(cache.putIfAbsent(key, f)).getOrElse(f)
      }
    }
}
