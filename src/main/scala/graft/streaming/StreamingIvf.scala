package graft.streaming

import graft.operators.IvfSimilarity
import graft.Tables.PinOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest for the durable IVF index — the vector-search twin of
  * [[graft.pipelines.CorpusPipeline.runStreamingNearDup]]'s
  * near-dup-on-arrival: arriving vectors are assigned to the EXISTING
  * trained centroids per micro-batch and appended to the hive-partitioned
  * posting lists, so the index keeps answering probes while the corpus
  * grows; a full re-train runs on a maintenance cadence (stream stopped),
  * and converges to exactly the index a from-scratch batch build would
  * produce (spec-pinned bit-for-bit — centroid training is deterministic
  * in the row SET, see [[IvfSimilarity.trainCentroids]]).
  *
  * Index layout — a versioned snapshot, so re-train is atomic to probes:
  * {{{
  * indexDir/
  *   _CURRENT            # text file holding the live version number
  *   v=1/
  *     centroids/        # wide (d, cx0..cx{K-1}) frame, K x dims values
  *     postings/
  *       batch_id=-1/    # the build (or re-train) fold, hive cid=... inside
  *       batch_id=7/     # one dir per streamed micro-batch, hive cid=...
  * }}}
  * Probes resolve `_CURRENT`, prune postings to the query's cluster via
  * the `cid=` partition dirs, and never see a half-written snapshot:
  * [[retrain]] materializes `v=N+1` COMPLETELY before flipping the
  * pointer. Streamed appends write `batch_id=N` overwrite dirs (the
  * [[graft.pipelines.CorpusPipeline]] exactly-once pattern: a replayed
  * batch rewrites its own dir; the seed fold is `batch_id=-1`, which no
  * stream batch id can collide with).
  *
  * Scale: per batch, assignment is one broadcast join against K x dims
  * centroid values plus one shuffle of the BATCH (never the index); the
  * posting append touches only the new rows. Probe cost stays ~1/K of the
  * corpus via partition pruning regardless of how many batches appended.
  * Re-train is the only whole-index pass, and it is scheduled maintenance.
  */
object StreamingIvf {

  import IvfSimilarity.{assignPass, compFrame, pqCentFrom, pqCodesFrom, trainCentroids}

  /** Live snapshot version. Heals the tiny delete-then-rename window of
    * [[writeCurrent]]: a crash there leaves only `_CURRENT.tmp`, whose
    * content is the fully-materialized new version — promote it.
    */
  private[graft] def currentVersion(spark: SparkSession, indexDir: String): Int = {
    val v = Snapshots.currentVersion(spark, indexDir, "ivf index")
    require(v.isDefined, s"no IVF index at $indexDir (missing _CURRENT; run buildIndex first)")
    v.get
  }

  private def versionDir(indexDir: String, v: Int) = s"$indexDir/v=$v"

  /** Train centroids on `emb` and materialize snapshot v=1. The seed frame
    * must contain vec_ids 0..K-1 (the deterministic first-K init).
    */
  def buildIndex(emb: DataFrame, indexDir: String): Unit = {
    val spark = emb.sparkSession
    writeSnapshot(spark, emb, indexDir, v = 1)
    Snapshots.writeCurrent(Snapshots.fsOf(spark, new org.apache.hadoop.fs.Path(indexDir)), new org.apache.hadoop.fs.Path(indexDir), 1, "ivf index")
  }

  /** Materialize `v=$v` completely: train on `emb`, fold every vector's
    * posting row into `batch_id=-1` partitioned by cid, and train + store
    * the PQ layer (long-form codebooks + every vector's M-subspace code)
    * from the SAME component frame — a snapshot serves both exact-cosine
    * probes (postings) and ADC probes (codes) after one build.
    */
  private def writeSnapshot(spark: SparkSession, emb: DataFrame, indexDir: String, v: Int): Unit = {
    val vdir = versionDir(indexDir, v)
    val e    = emb.pin() // comp + assignment + join re-read it
    val c    = compFrame(e).pin()
    val cent = trainCentroids(c)
    cent.write.mode("overwrite").parquet(s"$vdir/centroids")
    val assigned = e.join(
      assignPass(c, spark.read.parquet(s"$vdir/centroids")).select(col("vec_id"), col("cid")),
      "vec_id"
    )
    assigned
      .repartition(col("cid"))
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(s"$vdir/postings/batch_id=-1")
    pqCentFrom(c).write.mode("overwrite").parquet(s"$vdir/pq_cent")
    pqCodesFrom(c, spark.read.parquet(s"$vdir/pq_cent"))
      .write
      .mode("overwrite")
      .parquet(s"$vdir/pq_codes")
  }

  /** The live snapshot's PQ artifacts (codebooks, codes) — the ADC frame
    * an IVFPQ-style probe scores instead of raw embeddings. NOTE: codes
    * cover the vectors present at build/[[retrain]] time; streamed
    * arrivals join the PQ layer at the next retrain (the standard
    * Faiss-ops split: postings serve arrivals exactly, the compressed
    * layer refreshes on the maintenance cadence). Tombstoned vectors are
    * masked here too, so ADC scoring never resurrects a deleted id.
    */
  def pqLayer(spark: SparkSession, indexDir: String): (DataFrame, DataFrame) = {
    val vdir = versionDir(indexDir, currentVersion(spark, indexDir))
    (spark.read.parquet(s"$vdir/pq_cent"),
      minusTombstones(spark, vdir, spark.read.parquet(s"$vdir/pq_codes")))
  }

  /** DELETE vectors from the live index — the tombstone half of index
    * maintenance (production vector stores see deletions, not only
    * upserts). Deletes append an id dir under the live snapshot's
    * `tombstones/`; probes and the PQ layer mask tombstoned ids with a
    * BROADCAST anti-join (bounded by deletes since the last [[retrain]] —
    * the version flip is the COMPACTION point: retrain excludes
    * tombstoned rows from the new snapshot and starts it with an empty
    * tombstone set, the relayout discipline). Idempotent: re-deleting an
    * id lands a redundant tombstone row that the distinct mask collapses.
    * CONCURRENCY: each delete writes its OWN uniquely-named dir (the
    * masks read the whole `tombstones/` tree, so naming never matters),
    * which makes concurrent delete() calls safe against each other — the
    * previous max+1 allocation let two racers compute the same index and
    * one caller's ids silently vanish under the other's overwrite. A
    * delete racing [[retrain]] is MACHINE-CHECKED via the retrain fence
    * (r19 left it a prose quiesce contract): retrain creates
    * `RETRAIN_FENCE` BEFORE reading the tombstone set, and delete()
    * checks the fence AFTER writing its tombstone dir — so either the
    * tombstone write happens-before the fence (and the retrain's listing
    * includes it) or the delete observes the fence and throws for the
    * caller to retry after the compaction. delete() also re-checks
    * `_CURRENT` after its write, catching the fence-removed-but-flipped
    * tail of the window. No schedule loses a tombstone silently.
    * CONSTRAINT (documented, spec-pinned contract): the deterministic
    * first-K centroid init reads vec_ids 0..K-1, so deleting a seed
    * vector requires a re-seeded rebuild rather than [[retrain]] — the
    * Faiss convention of an explicit training set, kept as ids here.
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    val v    = currentVersion(spark, indexDir)
    val vdir = versionDir(indexDir, v)
    val token = java.util.UUID.randomUUID().toString
    ids
      .select(col("vec_id"))
      .distinct()
      .write
      .mode("overwrite")
      .parquet(s"$vdir/tombstones/d=$token")
    // ORDER MATTERS: tombstone write first, fence check second (retrain
    // fences first, reads second) — the happens-before pair that makes
    // every interleaving either visible-to-retrain or loudly failed
    val fs = Snapshots.fsOf(spark, new org.apache.hadoop.fs.Path(indexDir))
    if (fs.exists(fencePath(indexDir)))
      throw new IllegalStateException(
        s"IVF delete raced a retrain: RETRAIN_FENCE is up at $indexDir, so the in-flight " +
          "compaction may not see tombstones landed in v=" + v +
          " — re-issue the delete once the retrain completes")
    val vAfter = currentVersion(spark, indexDir)
    if (vAfter != v)
      throw new IllegalStateException(
        s"IVF delete raced a retrain: tombstones landed in v=$v but _CURRENT is now v=$vAfter — " +
          "the compaction may not have seen them; re-issue the delete against the live snapshot")
  }

  /** The retrain fence marker: present while a [[retrain]] is between
    * its tombstone read and its pointer flip (plus cleanup). Content is
    * the target version, so a stale fence (crashed retrain) is
    * recognizable: target <= `_CURRENT` means the flip happened and only
    * cleanup was lost; target == `_CURRENT`+1 means the retrain died
    * before the flip and its partial `v=N+1` dir is garbage. Either way
    * the next [[retrain]] heals it; delete() fails loudly while one is
    * up (fail-stop beats a silently lost tombstone).
    */
  private def fencePath(indexDir: String) =
    new org.apache.hadoop.fs.Path(indexDir, "RETRAIN_FENCE")

  /** The live snapshot's accumulated tombstone ids, or None before the
    * first delete (and always None right after a [[retrain]] compaction).
    */
  private def tombstones(spark: SparkSession, vdir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$vdir/tombstones")
    if (Snapshots.fsOf(spark, p).exists(p))
      Some(
        spark.read
          .option("basePath", s"$vdir/tombstones")
          .parquet(s"$vdir/tombstones")
          .select(col("vec_id"))
          .distinct())
    else None
  }

  private def minusTombstones(spark: SparkSession, vdir: String, df: DataFrame): DataFrame =
    tombstones(spark, vdir).fold(df)(t => df.join(broadcast(t), Seq("vec_id"), "left_anti"))

  /** Start the ingest stream: arriving parquet files of (vec_id,
    * embedding, label) rows are assigned to the LIVE snapshot's trained
    * centroids and appended as one `batch_id=N` posting dir per
    * micro-batch (idempotent overwrite on replay). Arrivals do not move
    * centroids — that is [[retrain]]'s job, on a cadence with the stream
    * stopped (a version flip under a running stream would split one
    * batch's read and write across snapshots).
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpoint: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s    = batch.sparkSession
          val v    = currentVersion(s, indexDir)
          val vdir = versionDir(indexDir, v)
          val b    = batch.pin() // comp and the posting join both read it
          val assigned = b.join(
            assignPass(compFrame(b), s.read.parquet(s"$vdir/centroids")).select(col("vec_id"), col("cid")),
            "vec_id"
          )
          assigned
            .repartition(col("cid"))
            .write
            .mode("overwrite")
            .partitionBy("cid")
            .parquet(s"$vdir/postings/batch_id=$batchId")
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Full re-train on everything the live snapshot holds (seed fold plus
    * every streamed append): materialize `v=N+1` completely, flip
    * `_CURRENT`, drop the old snapshot. Probes before the flip read v=N
    * whole; probes after read v=N+1 whole — never a mix. Run with the
    * ingest stream stopped.
    */
  def retrain(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs   = Snapshots.fsOf(spark, root)
    val v    = currentVersion(spark, indexDir)
    // HEAL a stale fence (single-maintenance-writer contract: an existing
    // fence can only be a crashed retrain's): target <= v means only
    // cleanup was lost; target v+1 means it died before the flip — drop
    // its partial snapshot dir and take over
    val fence = fencePath(indexDir)
    if (fs.exists(fence)) {
      val in     = fs.open(fence)
      val target = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt finally in.close()
      if (target > v) fs.delete(new org.apache.hadoop.fs.Path(versionDir(indexDir, target)), true)
      fs.delete(fence, false)
      ()
    }
    // FENCE UP before the tombstone read (the happens-before half that
    // pairs with delete()'s write-then-check): any delete that completed
    // without observing this fence landed its dir before this point and
    // the listing below includes it; any later delete fails loudly
    val os = fs.create(fence, false)
    try os.write((v + 1).toString.getBytes("UTF-8"))
    finally os.close()
    // COMPACTION: tombstoned rows leave the index here — the new snapshot
    // trains and posts exactly the surviving set (bit-identical to a
    // fresh build over it) and starts with an empty tombstone set
    val all = minusTombstones(
      spark,
      versionDir(indexDir, v),
      postings(spark, indexDir, v).select("vec_id", "embedding", "label"))
    writeSnapshot(spark, all, indexDir, v + 1)
    Snapshots.writeCurrent(fs, root, v + 1, "ivf index")
    fs.delete(new org.apache.hadoop.fs.Path(versionDir(indexDir, v)), true)
    fs.delete(fence, false)
    ()
  }

  private def postings(spark: SparkSession, indexDir: String, v: Int): DataFrame =
    spark.read
      .option("basePath", s"${versionDir(indexDir, v)}/postings")
      .parquet(s"${versionDir(indexDir, v)}/postings")

  /** Probe the live snapshot: rank `query` (one (vec_id, embedding) row)
    * against the trained centroids, then score ONLY the nearest cluster's
    * posting partition — the `cid=` filter is a literal, so it prunes at
    * the dir listing (the 1-value collect is a bounded driver action on a
    * K-row frame, not a data collect). Exact cosine over the stored
    * embeddings, top-k, ties to the smaller vec_id.
    */
  def probe(spark: SparkSession, indexDir: String, query: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val v     = currentVersion(spark, indexDir)
    val vdir  = versionDir(indexDir, v)
    val cent  = spark.read.parquet(s"$vdir/centroids")
    val qComp = compFrame(query.withColumn("label", lit(0)))
    val qcid = assignPass(qComp, cent).select("cid").collect() match {
      case Array(row) => row.getInt(0)
      case other      => throw new IllegalArgumentException(s"probe expects exactly one query row, got ${other.length}")
    }
    val qEmb = query.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    minusTombstones(spark, vdir, postings(spark, indexDir, v).filter(col("cid") === qcid))
      .join(broadcast(qEmb), col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), round(expr("cosine_sim(embedding, q_emb)"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
