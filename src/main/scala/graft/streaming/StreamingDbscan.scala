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
  * ADDITIVE over the pair store, and the census re-runs the SAME
  * [[Similarity.dbscanFromPairs]] body (pointer-doubling CC over the
  * core-core subgraph, O(log diameter) rounds) — so the published census
  * is BIT-IDENTICAL BY CONSTRUCTION to the batch `q_embed_dbscan` on the
  * union corpus (spec-pinned, with restart continuity).
  *
  * Cost shape per fold: pair generation is |batch| × its blocks (the
  * sum-over-blocks bound, same as the batch generator's sum(block²) but
  * restricted to the arriving slice); the census pass reads the pair
  * store once — the price of exact cluster maintenance under arrivals
  * (merges/splits of clusters cannot be decided locally), and the same
  * O(|pairs|) a batch rebuild would spend AFTER its much larger pair
  * scoring.
  *
  * Layout (the versioned-snapshot shape):
  * {{{
  * dbscanDir/
  *   _CURRENT            # live census version (torn flips heal forward)
  *   vecs/batch_id=3/    # (vec_id, label, embedding, bucket) arrivals
  *   pairs/batch_id=3/   # the NEW blocked pairs this fold, (vec_a < vec_b)
  *   stats/batch_id=3    # {batch_rows, store_rows, new_pairs} accounting
  *   census/v=2/         # the DBSCAN census table
  * }}}
  * Batch dirs are idempotent overwrites (a replayed batch regenerates the
  * identical vec and pair dirs from the identical store prefix); census
  * retains one prior version for in-flight readers.
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
          // land the batch under its blocking key (identical key to the
          // batch pair generator — the fold's exactness hinges on it)
          Similarity
            .withBlockKey(batch.dropDuplicates("vec_id").toDF())
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
          // census: the SAME dbscanFromPairs body the batch gate runs,
          // over the accumulated pair store and the full vector universe
          val allPairs = s.read
            .option("basePath", s"$dbscanDir/pairs")
            .parquet(s"$dbscanDir/pairs")
          val v = currentVersion(s, dbscanDir).getOrElse(0) + 1
          val (censusFrame, censusPins) =
            Similarity.dbscanFromPairsTracked(allPairs, store.select(col("vec_id")), minPts)
          censusFrame.write.mode("overwrite").parquet(s"$dbscanDir/census/v=$v")
          val root = new org.apache.hadoop.fs.Path(dbscanDir)
          val fs   = Snapshots.fsOf(s, root)
          val statsDir = new org.apache.hadoop.fs.Path(s"$dbscanDir/stats")
          fs.mkdirs(statsDir)
          val statsJson =
            s"""{"batch_id":$batchId,"batch_rows":${batchVecs.count()},""" +
              s""""store_rows":${store.count()},""" +
              s""""new_pairs":${s.read.parquet(s"$dbscanDir/pairs/batch_id=$batchId").count()}}"""
          val statsOut = fs.create(new org.apache.hadoop.fs.Path(statsDir, s"batch_id=$batchId"), true)
          try statsOut.write(statsJson.getBytes("UTF-8"))
          finally statsOut.close()
          Snapshots.writeCurrent(fs, root, v, "streaming dbscan")
          // retain-one for the census; vec and pair dirs are the fold's
          // durable state (they ARE the index), never reclaimed
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$dbscanDir/census/v=${v - 2}"), true)
            ()
          }
          (batchVecs +: censusPins).foreach(Tables.unpin)
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
