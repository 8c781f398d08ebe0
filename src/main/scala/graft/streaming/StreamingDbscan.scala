package graft.streaming

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DBSCAN census — the density-clustering twin of
  * [[StreamingGraph]]: arriving vectors land in the LSH-blocked store per
  * micro-batch, each fold generates ONLY the new eps-neighbor pairs (this
  * batch × its blocks in the accumulated store — never all-pairs, never a
  * re-score of old×old), appends them to a durable pair store, and
  * republishes the `q_embed_dbscan` census behind the shared [[Snapshots]]
  * `_CURRENT` flip.
  *
  * WHY THE FOLD IS EXACT: the blocked pair set of the union corpus is
  * exactly ⋃_k {pairs with ≥1 endpoint in batch k, both in the store as
  * of batch k} — a pair {x, y} materializes once, in the fold where the
  * LATER endpoint arrives (both-in-batch pairs canonicalize via
  * least/greatest + distinct), and `cosine_sim` is argument-order
  * symmetric (commutative multiplies, same index order), so every stored
  * pair carries the identical rounded score the batch generator
  * ([[Similarity.embedNearDupPairs]]) would compute. Degrees are then
  * ADDITIVE over the arriving pairs — each fold writes this batch's
  * (vec_id, deg) DELTA partial and re-aggregates the per-batch partials
  * (the [[StreamingNb]] frequency-store discipline), so core status
  * never re-reads the pair store — and the census re-runs the SAME
  * [[Similarity.dbscanBody]] the batch gate runs (pointer-doubling CC
  * over the core-core subgraph, O(log diameter) rounds) — so the
  * published census is BIT-IDENTICAL BY CONSTRUCTION to the batch
  * `q_embed_dbscan` on the union corpus (spec-pinned, with restart
  * continuity).
  *
  * EXACTLY-ONCE per vec_id is ENFORCED, not assumed (r19): the arriving
  * batch dedups within itself and anti-joins every earlier landed
  * batch's ids (own dir excluded, so replays regenerate identical
  * dirs); re-deliveries are dropped and counted as `dup_vec_ids` in
  * `stats/` — without this a re-delivered id would inflate degrees and
  * the census universe, and the streamed census could diverge from the
  * batch gate depending on whether the copies shared a batch.
  *
  * Cost shape per fold: pair generation is |batch| × its blocks (the
  * sum-over-blocks bound, same as the batch generator's sum(block²) but
  * restricted to the arriving slice); degrees re-aggregate the
  * vec-shaped delta partials, NOT the pair store; the pair store is
  * read once, filtered to core-incident pairs for the CC subgraph and
  * border join — the documented O(|core-incident pairs|) price of exact
  * cluster maintenance under arrivals (merges/splits of clusters cannot
  * be decided locally; SCALE.md), and the same pass a batch rebuild
  * would spend AFTER its much larger pair scoring. The fold's real read
  * shape is observable: `stats/` carries {degree_rows, cc_pairs_read}.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * dbscanDir/
  *   _CURRENT            # live census version (torn flips heal forward)
  *   vecs/batch_id=3/    # (vec_id, label, embedding, bucket) arrivals
  *   pairs/batch_id=3/   # the NEW blocked pairs this fold, (vec_a < vec_b)
  *   deg/batch_id=3/     # this batch's ADDITIVE (vec_id, deg) delta
  *   stats/batch_id=3    # {batch_rows, dup_vec_ids, store_rows,
  *                       #  new_pairs, degree_rows, cc_pairs_read}
  *   census/v=2/         # the DBSCAN census table
  * }}}
  * Batch dirs are idempotent overwrites (a replayed batch regenerates the
  * identical vec, pair and degree-delta dirs from the identical store
  * prefix); census retains one prior version for in-flight readers.
  */
object StreamingDbscan {

  /** Live census version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, dbscanDir: String): Option[Int] =
    Snapshots.currentVersion(spark, dbscanDir, "streaming dbscan")

  /** Start the ingest stream over arriving parquet (vec_id, embedding,
    * label) rows. `threshold`/`minPts` default to the `q_embed_dbscan`
    * gate constants.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      dbscanDir: String,
      checkpoint: String,
      threshold: Double = 0.0,
      minPts: Int = Similarity.DbscanMinPts,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.functions.VectorFunctions.register(s)
          val root = new org.apache.hadoop.fs.Path(dbscanDir)
          val fs   = Snapshots.fsOf(s, root)
          // EXACTLY-ONCE per vec_id, enforced (r18 left it an implicit
          // contract): the arriving batch dedups within itself AND
          // anti-joins the vec_ids of every EARLIER landed batch — a
          // re-delivered id would otherwise inflate degrees and the
          // census universe. Own dir excluded so a replayed batch
          // regenerates its dirs identically instead of landing empty.
          val vecsBase = new org.apache.hadoop.fs.Path(s"$dbscanDir/vecs")
          // pinned: dup_vec_ids needs its count, and the anti-join below
          // reads it — one computation, block-local counts (r19 item #5)
          val deduped = Tables.pin(batch.dropDuplicates("vec_id").toDF())
          val fresh =
            if (fs.exists(vecsBase))
              deduped.join(
                s.read
                  .option("basePath", s"$dbscanDir/vecs")
                  .parquet(s"$dbscanDir/vecs")
                  .filter(col("batch_id") =!= batchId)
                  .select(col("vec_id")),
                Seq("vec_id"),
                "left_anti")
            else deduped
          // land the batch under its blocking key (identical key to the
          // batch pair generator — the fold's exactness hinges on it)
          Similarity
            .withBlockKey(fresh)
            .write
            .mode("overwrite")
            .parquet(s"$dbscanDir/vecs/batch_id=$batchId")
          val batchVecs = Tables.pin(s.read.parquet(s"$dbscanDir/vecs/batch_id=$batchId"))
          val store = s.read
            .option("basePath", s"$dbscanDir/vecs")
            .parquet(s"$dbscanDir/vecs")
          // NEW pairs only: this batch against every stored vector in the
          // same (label, bucket) block — a pair lands exactly once, in
          // the fold where its later endpoint arrives; both-in-batch
          // pairs canonicalize (least, greatest) and dedup
          val joined = store.alias("a").join(
            batchVecs.alias("b"),
            col("a.label") === col("b.label") && col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") =!= col("b.vec_id")
          )
          joined
            .select(
              least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
              greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
              round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cos_sim")
            )
            .filter(col("cos_sim") >= threshold)
            .select(col("vec_a"), col("vec_b"))
            .distinct()
            .write
            .mode("overwrite")
            .parquet(s"$dbscanDir/pairs/batch_id=$batchId")
          // ADDITIVE degree delta (r19: the incremental-degree trim):
          // each new pair adds 1 to both endpoints, so this batch's
          // (vec_id, deg) partial is a pure idempotent function of the
          // landed dirs — the StreamingNb frequency-store discipline.
          // The fold's degree frame re-aggregates the per-batch partials
          // (one row per (batch, touched vec) — vec-shaped), so the
          // whole PAIR store is no longer read for degrees.
          val newPairs = Tables.pin(s.read.parquet(s"$dbscanDir/pairs/batch_id=$batchId"))
          newPairs
            .select(col("vec_a").as("v"))
            .unionByName(newPairs.select(col("vec_b").as("v")))
            .groupBy(col("v"))
            .agg(count(lit(1)).as("deg"))
            .write
            .mode("overwrite")
            .parquet(s"$dbscanDir/deg/batch_id=$batchId")
          val degrees = Tables.pin(
            s.read
              .option("basePath", s"$dbscanDir/deg")
              .parquet(s"$dbscanDir/deg")
              .groupBy(col("v"))
              .agg(sum(col("deg")).as("deg")))
          // census: the SAME dbscanBody the batch gate runs, with core
          // status from the folded degree store; the pair store is read
          // ONCE — for the core-core CC subgraph and the border join —
          // the documented O(|core-incident pairs|) price of exact
          // cluster maintenance under arrivals (SCALE.md)
          val allPairs = Tables.pin(
            s.read
              .option("basePath", s"$dbscanDir/pairs")
              .parquet(s"$dbscanDir/pairs")
              .select(col("vec_a"), col("vec_b")))
          val v = currentVersion(s, dbscanDir).getOrElse(0) + 1
          val (censusFrame, censusPins, ccPairsRead) =
            Similarity.dbscanBody(allPairs, degrees, store.select(col("vec_id")), minPts)
          censusFrame.write.mode("overwrite").parquet(s"$dbscanDir/census/v=$v")
          val statsDir = new org.apache.hadoop.fs.Path(s"$dbscanDir/stats")
          fs.mkdirs(statsDir)
          // observability: dup_vec_ids makes a violated delivery contract
          // visible; degree_rows/cc_pairs_read expose the fold's real
          // read shape (vec-shaped degrees, core-incident CC pairs).
          // cc_pairs_read comes from dbscanBody's own pinned core-core
          // subgraph, and store_rows folds additively from the prior
          // stats record — the fold no longer pays a pair-store semi-join
          // or a full vec-store scan for its counters (r19 items)
          val batchRows = batchVecs.count()
          val storeRows =
            Snapshots.priorStatsField(fs, statsDir, batchId, "store_rows", 0L) + batchRows
          val statsJson =
            s"""{"batch_id":$batchId,"batch_rows":$batchRows,""" +
              s""""dup_vec_ids":${deduped.count() - batchRows},""" +
              s""""store_rows":$storeRows,""" +
              s""""new_pairs":${newPairs.count()},""" +
              s""""degree_rows":${degrees.count()},""" +
              s""""cc_pairs_read":$ccPairsRead}"""
          val statsOut = fs.create(new org.apache.hadoop.fs.Path(statsDir, s"batch_id=$batchId"), true)
          try statsOut.write(statsJson.getBytes("UTF-8"))
          finally statsOut.close()
          Snapshots.writeCurrent(fs, root, v, "streaming dbscan")
          // retain-one for the census; vec, pair and degree-delta dirs
          // are the fold's durable state (they ARE the index), never
          // reclaimed
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$dbscanDir/census/v=${v - 2}"), true)
            ()
          }
          (Seq(batchVecs, newPairs, degrees, allPairs, deduped) ++ censusPins).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live census — bit-identical to the batch `q_embed_dbscan`
    * ([[Similarity.dbscanFromPairs]] over
    * [[Similarity.embedNearDupPairs]]) on the union of every landed
    * vector.
    */
  def census(spark: SparkSession, dbscanDir: String): DataFrame = {
    val v = currentVersion(spark, dbscanDir).getOrElse(
      throw new IllegalStateException(s"no published census under $dbscanDir (stream has not folded yet)"))
    spark.read.parquet(s"$dbscanDir/census/v=$v")
  }
}
