package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Batch output layout for training-data pipelines: hive-partitioned
  * parquet with controlled file counts and within-file ordering.
  *
  * Why each knob exists at 100 TB:
  *   - `repartition(partition cols + file salt)` aligns shuffle output with
  *     the directory layout. Without it every task holds a writer per
  *     partition value it happens to see — the classic small-files
  *     explosion (tasks x partition-values files). With it, each output
  *     file is produced by exactly one task.
  *   - the salt (`pmod(xxhash64(key), filesPerPartition)`) splits hot
  *     partition values across `filesPerPartition` tasks, so one giant
  *     partition (the skewed-language problem) doesn't serialize into a
  *     single writer. Deterministic: re-running the job re-creates the
  *     same file assignment (task retries stay consistent, unlike a
  *     round-robin or random salt).
  *   - `sortWithinPartitions` clusters rows inside each file so parquet
  *     row-group min/max stats actually prune on the sort key downstream
  *     (scan skips whole row groups on e.g. `doc_id BETWEEN ...`).
  *   - `maxRecordsPerFile` caps any single file regardless of skew, so a
  *     misestimated salt can't produce a multi-GB file that some later
  *     reader has to split poorly.
  *
  * The sibling read path is plain `spark.read.parquet(path)`: Spark
  * discovers the hive layout and prunes partition directories on
  * `partition-col = ...` filters (asserted in SinksSpec).
  */
object Sinks {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 1L << 20
  ): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    val saltSource = (if (sortCols.nonEmpty) sortCols else df.columns.toSeq).map(col)
    val salted = df.withColumn("_file", pmod(xxhash64(saltSource: _*), lit(filesPerPartition)))
    salted
      .repartition((partitionCols :+ "_file").map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .drop("_file")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Range-clustered layout: `repartitionByRange` assigns each output file
    * a DISJOINT slice of the sort key (sampled range boundaries), and the
    * within-partition sort tightens row-group min/max inside each file. A
    * downstream `key BETWEEN a AND b` scan then skips whole FILES on
    * parquet footer stats, not just row groups — at 100 TB the difference
    * between touching ~b-a worth of data and touching everything. This is
    * the single-dimension special case of [[writeZOrdered]].
    *
    * `repartitionByRange` samples the key distribution, so skew produces
    * uneven-but-bounded files rather than one hot writer.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Z-order (Morton) key over n non-negative integer dimensions:
    * interleaves the low `bits` of each, dimension j supplying bit
    * `n*i + j`, so that curve-adjacent keys are close in EVERY dimension.
    * Built from shift/and/or primitives — pure whole-stage codegen, no
    * UDF. Callers normalize real columns into [0, 2^bits) first (min-max
    * scale with FIXED bounds, so the key — and therefore the file
    * layout — is deterministic across runs and retries); [[compact]]'s
    * `zorderCols` path does that scaling inline.
    */
  def zorderKey(dims: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    val n = dims.size
    require(n >= 1 && bits >= 1 && n * bits <= 62, s"need 1 <= dims*bits <= 62, got $n x $bits")
    dims.zipWithIndex
      .map { case (c, j) =>
        (0 until bits)
          .map(i => shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), n * i + j))
          .reduce(_.bitwiseOR(_))
      }
      .reduce(_.bitwiseOR(_))
  }

  /** Two-dimension form (x at even bit positions, y at odd). */
  def zorderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column, bits: Int = 16): org.apache.spark.sql.Column =
    zorderKey(Seq(x, y), bits)

  /** Multi-dimensional clustering: range-partition + sort on the z-order
    * key, so every output file covers a small bounding BOX in (x, y) —
    * min/max footer stats then prune scans filtered on EITHER dimension.
    * A plain `writeRangeSorted(x)` file spans the full y range; z-order is
    * what makes two-column point/range lookups skip data at 100 TB (the
    * same layout Delta/Iceberg `OPTIMIZE ZORDER BY` produces).
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column,
      nFiles: Int,
      bits: Int = 16
  ): Unit =
    df.withColumn("_z", zorderKey(x, y, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Durable build-once artifact: if `path` holds a committed write
    * (`_SUCCESS` marker), read it back; otherwise run `write` (the caller
    * picks the layout — [[writePartitioned]] for partition-pruned probes,
    * [[writeRangeSorted]] for id-range artifacts) and read the result.
    * This is the production form of the bench's `localCheckpoint` artifact
    * caching: survives session restarts and executor loss, and a probe
    * job can run against an index built by an earlier job. The `_SUCCESS`
    * check makes a torn write (job killed mid-write) rebuild rather than
    * serve a partial artifact (the overwrite-mode rewrite clears any
    * partial files).
    *
    * Concurrency: WITHIN a process, first-builds of the same path are
    * serialized on a per-path lock — two threads racing the same missing
    * artifact (e.g. parallel first-uses of the dedup cache in one session)
    * would otherwise both pass the exists check and interleave two
    * SaveMode.Overwrite writes into one `_SUCCESS`-marked directory that
    * then serves a silent mix of both writers' files. ACROSS jobs the
    * single-writer assumption stands: two separate JVMs building the same
    * missing artifact still race the overwrite — coordinate builds (or
    * pre-build) as with any non-transactional parquet output; readers of a
    * committed artifact are unaffected.
    */
  def durableArtifact(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  )(write: String => Unit): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    buildLocks.computeIfAbsent(path, _ => new Object).synchronized {
      if (!fs.exists(new org.apache.hadoop.fs.Path(hp, "_SUCCESS"))) write(path)
    }
    spark.read.parquet(path)
  }

  /** Per-artifact-path build locks for [[durableArtifact]]'s in-process
    * exists-then-write window. Unbounded only in the number of distinct
    * artifact paths a session touches (small by construction).
    */
  private val buildLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `action` (typically an artifact write) and return the `observe()`
    * metrics named in `expectedNames` that its query reported. Batch
    * `observe()` metrics surface on the WRITE command's own QueryExecution —
    * not on the source frame's — so the only public consumption path is a
    * [[QueryExecutionListener]]. Two sharp edges that listener has:
    *
    *   - it is SESSION-wide, so without filtering, metrics from any query
    *     completing during the build window (e.g. a concurrent non-durable
    *     run using the same observe() name) could be persisted into this
    *     artifact's `_metrics.json`. Captures are therefore restricted to
    *     `expectedNames` — the metric names the caller read off the build
    *     plan's own CollectMetrics nodes. (A same-named metric from a
    *     concurrent query in the SAME session remains indistinguishable;
    *     single-writer builds are already the [[durableArtifact]] contract.)
    *   - delivery is asynchronous: this polls until every expected name has
    *     landed, and if the poll times out it WARNS — an incomplete
    *     `_metrics.json` after `expectedNames.nonEmpty` is the exact
    *     silent-cap case the mechanism exists to prevent, so it must at
    *     least be loud.
    */
  def captureObservedMetrics(
      spark: org.apache.spark.sql.SparkSession,
      expectedNames: Set[String]
  )(action: => Unit): Map[String, org.apache.spark.sql.Row] = {
    val captured = scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long
      ): Unit = qe.observedMetrics.foreach {
        case (k, v) if expectedNames.contains(k) => captured.put(k, v)
        case _                                   => ()
      }
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception
      ): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      action
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!expectedNames.forall(captured.contains) && System.nanoTime() < deadline)
        Thread.sleep(25)
      val missing = expectedNames.diff(captured.keySet)
      if (missing.nonEmpty)
        System.err.println(
          s"[graft] WARNING: observe() metrics ${missing.mkString(", ")} did not arrive within 10s; " +
            "the persisted _metrics.json will be incomplete"
        )
    } finally spark.listenerManager.unregister(listener)
    captured.toMap
  }

  /** Persist observed metrics as `_metrics.json` inside an artifact
    * directory (underscore prefix: parquet readers ignore it). This is the
    * no-silent-caps rule surviving durable mode: the `graft.lsh_pairs`
    * capping counters only fire on the plan that BUILDS the artifact, so a
    * later session served the parquet read-back would otherwise have no way
    * to see that the build capped buckets.
    */
  def writeMetricsJson(
      spark: org.apache.spark.sql.SparkSession,
      artifactPath: String,
      metrics: Map[String, org.apache.spark.sql.Row]
  ): Unit = {
    def esc(s: String): String = s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }
    def jsonVal(v: Any): String = v match {
      case null                  => "null"
      // non-finite doubles/floats have no JSON literal — Number.toString
      // would emit bare NaN/Infinity and break every consumer's parse
      case d: java.lang.Double if d.isNaN || d.isInfinite => "null"
      case f: java.lang.Float if f.isNaN || f.isInfinite  => "null"
      case n: java.lang.Number   => n.toString
      case b: java.lang.Boolean  => b.toString
      case other                 => "\"" + esc(other.toString) + "\""
    }
    val body = metrics.toSeq.sortBy(_._1).map { case (name, row) =>
      val fields = row.schema.fieldNames
        .zip(row.toSeq)
        .map { case (f, v) => "\"" + esc(f) + "\":" + jsonVal(v) }
      "\"" + esc(name) + "\":" + fields.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val out = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(artifactPath), "_metrics.json")
    val fs  = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os  = fs.create(out, true)
    try os.write(body.getBytes("UTF-8"))
    finally os.close()
  }

  /** What a [[compact]] run rewrote: the output file count, plus the file
    * NAMES of the exact input snapshot the rewrite read. The snapshot is
    * what makes a concurrent-writer-safe swap possible: any file present in
    * the source directory later that is NOT in this set was appended after
    * the snapshot and is not represented in the compacted output — the
    * swap must carry it forward, never delete it
    * ([[graft.pipelines.CorpusPipeline.swapIn]]).
    */
  final case class CompactResult(nOutputFiles: Int, inputFiles: Set[String])

  /** Compact a fragmented parquet directory into ~`targetFileBytes` files.
    *
    * Streaming micro-batch sinks and over-parallel writers leave thousands
    * of small files; at 100 TB that murders scan planning (one listing +
    * footer read per file) and wastes row-group compression. Sizing uses
    * the actual on-disk bytes of the source files (not a row-count guess).
    *
    * Layout (file-skipping is the other half of compaction):
    *   - `sortCols` nonEmpty: `repartitionByRange` on the keys + local
    *     sort — per-file key ranges are DISJOINT, so footer min/max stats
    *     prune whole FILES for key predicates (round-robin + local sort
    *     only enabled row-group pruning; every file spanned the full
    *     range). Range boundaries come from Spark's seeded reservoir
    *     sample — deterministic for identical input, re-run-stable.
    *   - `zorderCols` nonEmpty (takes precedence): range-partition + sort
    *     on a [[zorderKey]] so EVERY listed column gets a bounded per-file
    *     range — multi-column skipping where a single sort key only serves
    *     its leading column.
    *   - neither: plain round-robin `repartition(n)` (a shuffle that
    *     local-sorts for retry determinism, unlike `coalesce`, which would
    *     also cap the read parallelism of the compaction job itself).
    *
    * Returns the output file count plus the input snapshot
    * ([[CompactResult]]); `df.inputFiles` is read off the FileIndex the
    * rewrite job itself scans, so the snapshot is exact, not a re-listing.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil,
      zorderCols: Seq[String] = Nil,
      zorderBits: Int = 8
  ): CompactResult = {
    val df = spark.read.parquet(inPath)
    val snapshot =
      df.inputFiles.map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    // Hadoop FS, not java.nio: the input may live on any cluster filesystem
    val hp = new org.apache.hadoop.fs.Path(inPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hp).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val laidOut =
      if (zorderCols.nonEmpty) {
        // min/max scaling bounds as a broadcast 1-row global (linear
        // scaling — the cheap variant; rank scaling resists skew but
        // costs a sort per column), then the raw-interleave [[zorderKey]]
        val aggs = zorderCols.flatMap { c =>
          Seq(min(col(c).cast("double")).as(s"_lo_$c"), max(col(c).cast("double")).as(s"_hi_$c"))
        }
        val stats = df.agg(aggs.head, aggs.tail: _*)
        val k     = (1L << zorderBits) - 1
        val scaled = zorderCols.map { c =>
          floor(
            (col(c).cast("double") - col(s"_lo_$c")) * k /
              greatest(col(s"_hi_$c") - col(s"_lo_$c"), lit(1e-12))
          ).cast("long")
        }
        df.crossJoin(org.apache.spark.sql.functions.broadcast(stats))
          .withColumn("_z", zorderKey(scaled, zorderBits))
          .repartitionByRange(nFiles, col("_z"))
          .sortWithinPartitions(col("_z"))
          .drop("_z" +: zorderCols.flatMap(c => Seq(s"_lo_$c", s"_hi_$c")): _*)
      } else if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    laidOut.write.mode(SaveMode.Overwrite).parquet(outPath)
    CompactResult(spark.read.parquet(outPath).inputFiles.length, snapshot)
  }
}
