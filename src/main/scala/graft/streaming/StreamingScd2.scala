package graft.streaming

import graft.Tables
import graft.operators.Relational2
import graft.operators.Relational2.Scd2Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming SCD TYPE-2 — history-preserving upsert on arrival, the
  * streaming twin of `q_scd2_history` ([[Relational2.scd2History]]) the
  * way [[StreamingUpsert]] twins the overwrite MERGE: arriving status
  * observations fold into versioned dimension rows with tiled
  * [valid_from, valid_to) intervals, and the full history table
  * republishes behind the shared [[Snapshots]] `_CURRENT` protocol. The
  * observation schema is a PARAMETER ([[Scd2Cols]]): key, event-time,
  * tiebreak and status column names are caller-supplied, with the events
  * fixture as the default (the spec runs a second schema through the
  * same fold code).
  *
  * Layout — the versioned-snapshot shape:
  * {{{
  * scdDir/
  *   _CURRENT               # live version pointer (torn flips heal forward)
  *   events/batch_id=7/     # distinct observation rows, one dir per batch
  *                          #   RETAINED: the per-key observation log the
  *                          #   late-data recovery path re-derives from
  *   stats/batch_id=7       # fold accounting; ALSO the replay marker —
  *                          #   written LAST, so its existence proves the
  *                          #   fold fully published (see replay safety)
  *   wm/v=3                 # high watermark (max folded event ts, micros)
  *   hist/v=3/              # the full SCD2 history table
  * }}}
  *
  * THE FOLD IS INCREMENTAL — O(|hist| + |batch|) per fold for in-order
  * arrivals (the [[StreamingUpsert]] r17 bound, observable via
  * `stats/batch_id=N`):
  *
  *   1. within-batch change-collapse (the batch twin's lag rule over this
  *      batch alone);
  *   2. BOUNDARY collapse: a key whose first batch change equals its
  *      published CURRENT status extends that version instead of opening
  *      a new one (only the first can collapse — within-batch collapse
  *      already guarantees adjacent batch changes differ);
  *   3. surviving changes renumber from the key's current version, the
  *      previous current row closes at the first new valid_from, and
  *      untouched rows pass through byte-identical.
  *
  * Prefix-associativity of the change-collapse fold makes the published
  * table BIT-IDENTICAL BY CONSTRUCTION to the batch `scd2History` over
  * the union of every landed observation (spec-pinned) for events
  * arriving in event-time order across folds — the per-key-commit-order
  * contract every CDC transport provides.
  *
  * LATE-DATA RECOVERY (r18; replaces the r17 fail-fast cliff): a batch
  * carrying observations at or before the folded watermark CANNOT fold
  * incrementally (a late event rewrites already-closed intervals), but
  * SCD2 derivation is per-key independent — so the fold re-derives ONLY
  * the AFFECTED keys' histories from their complete landed observation
  * logs under `events/batch_id=*` and splices them into the published
  * table, while every other key in the batch still folds incrementally.
  * Cost is O(|late keys| · |their observations|), never O(corpus); the
  * fold records {n_late_keys, n_respliced_rows} under `stats/` so the
  * slow path is observable, not silent. In-order folds take the late
  * path never and publish byte-identical output to the r17 fold.
  * Storage: the observation log is retained (it IS the recovery input —
  * the raw CDC archive every production pipeline keeps anyway); an
  * operator bounding storage may compact dirs older than its maximum
  * tolerated lateness, giving up recovery beyond that horizon.
  *
  * REPLAY SAFETY (r18): foreachBatch re-executes the last batch after a
  * crash between the publish and the checkpoint commit. The fold is
  * idempotent under that replay by two rules: (a) `stats/batch_id=N` is
  * written LAST, strictly after the `_CURRENT` flip, so its existence
  * proves batch N fully published — a replayed batch that finds it SKIPS
  * as a no-op instead of re-folding (the r17 fold threw its own
  * watermark back at itself here, permanently wedging the stream); (b) a
  * crash in the window after the flip but before the stats write replays
  * into the late-data path (every batch key's min ts ≤ the just-written
  * watermark), which re-derives those keys from the observation log —
  * a pure function of the landed dirs, so the republish is bit-identical.
  */
object StreamingScd2 {

  private val Sentinel = 9999999999L

  /** Live version, or None before the first fold. */
  private[graft] def currentVersion(spark: SparkSession, scdDir: String): Option[Int] =
    Snapshots.currentVersion(spark, scdDir, "streaming scd2")

  private def readWatermark(
      fs: org.apache.hadoop.fs.FileSystem,
      scdDir: String,
      v: Int
  ): Long = {
    val p  = new org.apache.hadoop.fs.Path(s"$scdDir/wm/v=$v")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    finally in.close()
  }

  /** One incremental fold of already-change-ordered batch rows against
    * the published history: within-batch collapse, boundary collapse,
    * renumber + tile, untouched passthrough. Returns the folded history
    * frame plus the pins the caller reclaims after materializing.
    */
  private def foldIncremental(
      prior: DataFrame,
      ev: DataFrame,
      c: Scd2Cols
  ): (DataFrame, Seq[DataFrame]) = {
    // 1. within-batch change collapse + renumber (the batch twin's lag
    // rule applied to this batch alone)
    val w = Window.partitionBy(col(c.key)).orderBy(col(c.ts), col(c.status), col(c.tie))
    val chg = ev
      .withColumn("prev_type", lag(col(c.status), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col(c.status))
      .withColumn("rn", row_number().over(w))

    // the touched keys' OPEN rows — everything the fold may close
    val curRows = Tables.pin(
      prior
        .filter(col("is_current") === 1L)
        .join(chg.select(col(c.key)).distinct(), Seq(c.key), "left_semi"))

    // 2. boundary collapse: drop a first batch change equal to the
    // published current status (it extends that version); only the
    // first can collapse — batch changes are pairwise distinct
    val dropFirst = curRows
      .join(chg.filter(col("rn") === 1).select(col(c.key), col(c.status)), Seq(c.key))
      .filter(col("status") === col(c.status))
      .select(col(c.key), lit(1).as("drop_first"))
    val surviving = chg
      .join(dropFirst, Seq(c.key), "left")
      .filter(col("drop_first").isNull || col("rn") > 1)

    // 3. renumber from the key's current version; tile intervals
    val newRows = Tables.pin(
      surviving
        .withColumn("rn2", row_number().over(w))
        .withColumn("vf", unix_timestamp(col(c.ts)))
        .withColumn("vt", lead(unix_timestamp(col(c.ts)), 1).over(w))
        .join(curRows.select(col(c.key), col("version").as("cur_version")), Seq(c.key), "left")
        .select(
          col(c.key),
          (coalesce(col("cur_version"), lit(0L)) + col("rn2")).as("version"),
          col(c.status).as("status"),
          col("vf").as("valid_from"),
          coalesce(col("vt"), lit(Sentinel)).as("valid_to"),
          when(col("vt").isNull, lit(1L)).otherwise(lit(0L)).as("is_current")
        ))
    val usersWithNew = newRows.select(col(c.key)).distinct()
    val closedCur = curRows
      .join(
        newRows.groupBy(col(c.key)).agg(min(col("valid_from")).as("close_at")),
        Seq(c.key))
      .select(
        col(c.key),
        col("version"),
        col("status"),
        col("valid_from"),
        col("close_at").as("valid_to"),
        lit(0L).as("is_current"))
    // untouched prior rows pass through byte-identical (a touched key
    // whose batch fully collapsed keeps its open row too)
    val keepPrior = prior
      .join(usersWithNew.withColumn("has_new", lit(1)), Seq(c.key), "left")
      // coalesce matters: has_new is NULL for untouched keys, and
      // !(true && null) is null — a bare filter would drop every
      // untouched OPEN row
      .filter(!(col("is_current") === 1L && coalesce(col("has_new"), lit(0)) === 1))
      .drop("has_new")

    (keepPrior.unionByName(closedCur).unionByName(newRows), Seq(curRows, newRows))
  }

  /** Start the history stream over arriving parquet observation rows.
    * `schemaDdl`/`cols` default to the events fixture shape
    * (user_id, ts, event_id, event_type) — pass both to run any other
    * (key, ordering, status) schema through the same fold.
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      scdDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None,
      schemaDdl: String = "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, event_type STRING",
      cols: Scd2Cols = Scd2Cols()
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val c = cols
    Relational2.validateScd2Cols(c) // reserved-name collisions fail here, not mid-fold
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s    = batch.sparkSession
          val root = new org.apache.hadoop.fs.Path(scdDir)
          val fs   = Snapshots.fsOf(s, root)
          // REPLAY MARKER: stats/batch_id=N is written strictly AFTER the
          // version flip, so finding it means this batch already published
          // completely — the replay is a no-op (re-folding would compare
          // the batch against its OWN watermark and take the late path for
          // every key: correct but wasted; before r18 it threw and wedged)
          val statsPath = new org.apache.hadoop.fs.Path(s"$scdDir/stats/batch_id=$batchId")
          if (!fs.exists(statsPath)) {
            batch
              .select(col(c.key), col(c.ts), col(c.tie), col(c.status))
              .distinct() // re-delivery collapse, the StreamingUpsert rule
              .write
              .mode("overwrite")
              .parquet(s"$scdDir/events/batch_id=$batchId")
            val ev = Tables.pin(s.read.parquet(s"$scdDir/events/batch_id=$batchId"))

            val current = currentVersion(s, scdDir)
            val wmPrior = current.map(v => readWatermark(fs, scdDir, v))
            val bounds  = ev.agg(max(unix_micros(col(c.ts)))).head()
            val batchMax = bounds.getLong(0)

            // LATE keys: any key carrying an observation at or before the
            // folded watermark — their closed intervals may need rewriting,
            // so they leave the incremental path and re-derive from the
            // observation log (per-key independence makes that exact). The
            // global watermark is conservative per key: a key flagged late
            // against the global mark but in-order against its own history
            // re-derives to the identical rows, just less incrementally.
            val lateKeys = wmPrior match {
              case Some(wm) =>
                Tables.pin(
                  ev.groupBy(col(c.key))
                    .agg(min(unix_micros(col(c.ts))).as("kmin"))
                    .filter(col("kmin") <= wm)
                    .select(col(c.key)))
              case None => null
            }
            val nLate = if (lateKeys == null) 0L else lateKeys.count()

            val prior = current
              .map(v => s.read.parquet(s"$scdDir/hist/v=$v"))
              .getOrElse(
                s.createDataFrame(
                  new java.util.ArrayList[org.apache.spark.sql.Row](),
                  org.apache.spark.sql.types.StructType.fromDDL(
                    s"${schema(c.key).toDDL}, version BIGINT, status STRING, " +
                      "valid_from BIGINT, valid_to BIGINT, is_current BIGINT")))

            val (folded, foldPins, nRespliced) =
              if (nLate == 0L) {
                val (f, pins) = foldIncremental(prior, ev, c)
                (f, pins, 0L)
              } else {
                // in-order keys fold incrementally as always…
                val evIn          = ev.join(lateKeys, Seq(c.key), "left_anti")
                val (incr, pins)  = foldIncremental(prior, evIn, c)
                // …late keys re-derive COMPLETELY from their landed
                // observation log (includes this batch's dir, just
                // written): exactly the batch derivation on exactly their
                // rows, so the splice keeps the table bit-identical to
                // the batch build on the union
                val allObs = s.read
                  .option("basePath", s"$scdDir/events")
                  .parquet(s"$scdDir/events")
                  .join(lateKeys, Seq(c.key), "left_semi")
                val respliced = Tables.pin(Relational2.scd2History(allObs, c))
                val spliced = incr
                  .join(lateKeys, Seq(c.key), "left_anti")
                  .unionByName(respliced)
                (spliced, pins :+ respliced, respliced.count())
              }

            val v = current.getOrElse(0) + 1
            folded.write.mode("overwrite").parquet(s"$scdDir/hist/v=$v")

            val wmNew = wmPrior.fold(batchMax)(math.max(_, batchMax))
            val wmDir = new org.apache.hadoop.fs.Path(s"$scdDir/wm")
            fs.mkdirs(wmDir)
            val wmOut = fs.create(new org.apache.hadoop.fs.Path(wmDir, s"v=$v"), true)
            try wmOut.write(wmNew.toString.getBytes("UTF-8"))
            finally wmOut.close()
            Snapshots.writeCurrent(fs, root, v, "streaming scd2")
            // retain-one for the history and watermark; the event audit
            // dirs are RETAINED — they are the late-data recovery log
            if (v > 2) {
              fs.delete(new org.apache.hadoop.fs.Path(s"$scdDir/hist/v=${v - 2}"), true)
              fs.delete(new org.apache.hadoop.fs.Path(s"$scdDir/wm/v=${v - 2}"), false)
              ()
            }
            // fold accounting AND replay marker — last, after the flip
            val statsJson =
              s"""{"batch_id":$batchId,"prior_rows":${prior.count()},"batch_rows":${ev.count()},""" +
                s""""n_late_keys":$nLate,"n_respliced_rows":$nRespliced,"watermark_micros":$wmNew}"""
            fs.mkdirs(statsPath.getParent)
            val statsOut = fs.create(statsPath, true)
            try statsOut.write(statsJson.getBytes("UTF-8"))
            finally statsOut.close()
            (Seq(ev) ++ foldPins ++ Option(lateKeys).toSeq).foreach(Tables.unpin)
          }
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live SCD2 history — bit-identical to the batch
    * [[Relational2.scd2History]] over the union of every landed
    * observation: by incremental-fold associativity for in-order
    * arrivals, by per-key re-derivation for late ones.
    */
  def history(spark: SparkSession, scdDir: String): DataFrame = {
    val v = currentVersion(spark, scdDir).getOrElse(
      throw new IllegalStateException(s"no published history under $scdDir (stream has not folded yet)"))
    spark.read.parquet(s"$scdDir/hist/v=$v")
  }
}
