package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming SCD TYPE-2 — history-preserving upsert on arrival, the
  * streaming twin of `q_scd2_history` ([[graft.operators.Relational2
  * .scd2History]]) the way [[StreamingUpsert]] twins the overwrite MERGE:
  * arriving status observations fold into versioned dimension rows with
  * tiled [valid_from, valid_to) intervals, and the full history table
  * republishes behind the shared [[Snapshots]] `_CURRENT` protocol.
  *
  * Layout — the versioned-snapshot shape:
  * {{{
  * scdDir/
  *   _CURRENT               # live version pointer (torn flips heal forward)
  *   events/batch_id=7/     # distinct observation rows, one dir per batch
  *   stats/batch_id=7       # fold-input accounting + watermark JSON
  *   wm/v=3                 # high watermark (max folded event ts, micros)
  *   hist/v=3/              # the full SCD2 history table
  * }}}
  *
  * THE FOLD IS INCREMENTAL — O(|hist| + |batch|) per fold, never a
  * re-derivation over every landed batch (the [[StreamingUpsert]] r17
  * bound, kept observable via `stats/batch_id=N`):
  *
  *   1. within-batch change-collapse (the batch twin's lag rule over this
  *      batch alone);
  *   2. BOUNDARY collapse: a user whose first batch change equals their
  *      published CURRENT status extends that version instead of opening
  *      a new one (only the first can collapse — within-batch collapse
  *      already guarantees adjacent batch changes differ);
  *   3. surviving changes renumber from the user's current version, the
  *      previous current row closes at the first new valid_from, and
  *      untouched rows pass through byte-identical.
  *
  * Prefix-associativity of the change-collapse fold makes the published
  * table BIT-IDENTICAL BY CONSTRUCTION to the batch `scd2History` over
  * the union of every landed observation (spec-pinned) — PROVIDED events
  * arrive in event-time order across folds, the per-key-commit-order
  * contract every CDC transport provides. The fold FAILS FAST on a
  * violation (batch min ts ≤ the stored high watermark) with an explicit
  * re-derive message instead of silently publishing a history that can
  * never match the batch twin — the [[StreamingGraph]].trust rule applied
  * to ordering instead of existence.
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

  /** Start the history stream over arriving parquet observation rows
    * (user_id, ts, event_id, event_type).
    */
  def ingest(
      spark: SparkSession,
      landingDir: String,
      scdDir: String,
      checkpoint: String,
      maxFilesPerTrigger: Option[Int] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, event_type STRING")
    val reader = spark.readStream.schema(schema)
    val stream =
      maxFilesPerTrigger.fold(reader)(n => reader.option("maxFilesPerTrigger", n)).parquet(landingDir)
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch
            .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
            .distinct() // re-delivery collapse, the StreamingUpsert rule
            .write
            .mode("overwrite")
            .parquet(s"$scdDir/events/batch_id=$batchId")
          val ev = Tables.pin(s.read.parquet(s"$scdDir/events/batch_id=$batchId"))

          val root    = new org.apache.hadoop.fs.Path(scdDir)
          val fs      = Snapshots.fsOf(s, root)
          val current = currentVersion(s, scdDir)
          // ORDERING CONTRACT: in-order arrival across folds. A late
          // event would have to rewrite already-closed intervals — the
          // incremental fold cannot stay bit-identical to the batch
          // derivation, so it refuses loudly instead of diverging.
          val bounds   = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
          val batchMin = bounds.getLong(0)
          val batchMax = bounds.getLong(1)
          current.foreach { v =>
            val wm = readWatermark(fs, scdDir, v)
            if (batchMin <= wm)
              throw new IllegalStateException(
                s"streaming scd2: batch $batchId contains an event at $batchMin micros at or before " +
                  s"the folded watermark $wm — events must arrive in event-time order (the CDC " +
                  "per-key commit-order contract); re-derive the history with the batch scd2History " +
                  "over the full corpus instead")
          }

          // 1. within-batch change collapse + renumber (the batch twin's
          // lag rule applied to this batch alone)
          val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_type"), col("event_id"))
          val chg = ev
            .withColumn("prev_type", lag(col("event_type"), 1).over(w))
            .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
            .withColumn("rn", row_number().over(w))

          val prior = current
            .map(v => s.read.parquet(s"$scdDir/hist/v=$v"))
            .getOrElse(
              s.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](),
                org.apache.spark.sql.types.StructType.fromDDL(
                  "user_id BIGINT, version BIGINT, status STRING, " +
                    "valid_from BIGINT, valid_to BIGINT, is_current BIGINT")))
          // the touched users' OPEN rows — everything the fold may close
          val curRows = Tables.pin(
            prior
              .filter(col("is_current") === 1L)
              .join(chg.select(col("user_id")).distinct(), Seq("user_id"), "left_semi"))

          // 2. boundary collapse: drop a first batch change equal to the
          // published current status (it extends that version); only the
          // first can collapse — batch changes are pairwise distinct
          val dropFirst = curRows
            .join(chg.filter(col("rn") === 1).select(col("user_id"), col("event_type")), Seq("user_id"))
            .filter(col("status") === col("event_type"))
            .select(col("user_id"), lit(1).as("drop_first"))
          val surviving = chg
            .join(dropFirst, Seq("user_id"), "left")
            .filter(col("drop_first").isNull || col("rn") > 1)

          // 3. renumber from the user's current version; tile intervals
          val newRows = Tables.pin(
            surviving
              .withColumn("rn2", row_number().over(w))
              .withColumn("vf", unix_timestamp(col("ts")))
              .withColumn("vt", lead(unix_timestamp(col("ts")), 1).over(w))
              .join(curRows.select(col("user_id"), col("version").as("cur_version")), Seq("user_id"), "left")
              .select(
                col("user_id"),
                (coalesce(col("cur_version"), lit(0L)) + col("rn2")).as("version"),
                col("event_type").as("status"),
                col("vf").as("valid_from"),
                coalesce(col("vt"), lit(Sentinel)).as("valid_to"),
                when(col("vt").isNull, lit(1L)).otherwise(lit(0L)).as("is_current")
              ))
          val usersWithNew = newRows.select(col("user_id")).distinct()
          val closedCur = curRows
            .join(
              newRows.groupBy(col("user_id")).agg(min(col("valid_from")).as("close_at")),
              Seq("user_id"))
            .select(
              col("user_id"),
              col("version"),
              col("status"),
              col("valid_from"),
              col("close_at").as("valid_to"),
              lit(0L).as("is_current"))
          // untouched prior rows pass through byte-identical (a touched
          // user whose batch fully collapsed keeps their open row too)
          val keepPrior = prior
            .join(usersWithNew.withColumn("has_new", lit(1)), Seq("user_id"), "left")
            // coalesce matters: has_new is NULL for untouched users, and
            // !(true && null) is null — a bare filter would drop every
            // untouched OPEN row
            .filter(!(col("is_current") === 1L && coalesce(col("has_new"), lit(0)) === 1))
            .drop("has_new")

          val v = current.getOrElse(0) + 1
          keepPrior
            .unionByName(closedCur)
            .unionByName(newRows)
            .write
            .mode("overwrite")
            .parquet(s"$scdDir/hist/v=$v")

          val wmDir = new org.apache.hadoop.fs.Path(s"$scdDir/wm")
          fs.mkdirs(wmDir)
          val wmOut = fs.create(new org.apache.hadoop.fs.Path(wmDir, s"v=$v"), true)
          try wmOut.write(batchMax.toString.getBytes("UTF-8"))
          finally wmOut.close()
          val statsDir = new org.apache.hadoop.fs.Path(s"$scdDir/stats")
          fs.mkdirs(statsDir)
          val statsJson =
            s"""{"batch_id":$batchId,"prior_rows":${prior.count()},"batch_rows":${ev.count()},"watermark_micros":$batchMax}"""
          val statsOut = fs.create(new org.apache.hadoop.fs.Path(statsDir, s"batch_id=$batchId"), true)
          try statsOut.write(statsJson.getBytes("UTF-8"))
          finally statsOut.close()
          Snapshots.writeCurrent(fs, root, v, "streaming scd2")
          // retain-one for the history, the watermark, and the event
          // audit dirs (folded batches are subsumed by the published
          // history — the store compacts as it folds)
          if (v > 2) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$scdDir/hist/v=${v - 2}"), true)
            fs.delete(new org.apache.hadoop.fs.Path(s"$scdDir/wm/v=${v - 2}"), false)
            ()
          }
          Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$scdDir/events/batch_id=*")))
            .getOrElse(Array.empty)
            .map(_.getPath)
            .filter(p => p.getName.stripPrefix("batch_id=").toLongOption.exists(_ <= batchId - 2))
            .foreach(fs.delete(_, true))
          Seq(ev, curRows, newRows).foreach(Tables.unpin)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The live SCD2 history — bit-identical to the batch
    * [[graft.operators.Relational2.scd2History]] over the union of every
    * landed observation (in-order arrival contract).
    */
  def history(spark: SparkSession, scdDir: String): DataFrame = {
    val v = currentVersion(spark, scdDir).getOrElse(
      throw new IllegalStateException(s"no published history under $scdDir (stream has not folded yet)"))
    spark.read.parquet(s"$scdDir/hist/v=$v")
  }
}
