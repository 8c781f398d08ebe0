package graft.streaming

import graft.TestSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD2: per-batch incremental history folds, published table
  * bit-identical to the batch `scd2History` on the union of landed
  * observations, restart continuity, boundary collapse across batch
  * edges, and the fail-fast ordering contract.
  */
class StreamingScd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Fixture events sorted by event time, split into `k` contiguous
    * time-ordered slices at DISTINCT-ts boundaries (a shared boundary ts
    * would make cross-batch (ts, type, id) ordering ambiguous, which the
    * fold rejects by design).
    */
  private def slices(k: Int): Seq[Seq[(Long, java.sql.Timestamp, Long, String)]] = {
    val rows = graft.Tables
      .events(spark, TestSpark.sfDir)
      .select("user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._2.getTime, r._4, r._3))
    val per = rows.length / k
    val cuts = (1 until k).map { i =>
      var c = i * per
      while (c < rows.length - 1 && rows(c)._2.getTime == rows(c - 1)._2.getTime) c += 1
      c
    }
    (Seq(0) ++ cuts :+ rows.length).sliding(2).map { case Seq(a, b) => rows.slice(a, b).toSeq }.toSeq
  }

  private def histRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed history == batch scd2History on the union, across folds and a restart") {
    val dir     = Files.createTempDirectory("streaming-scd2").toString
    val landing = s"$dir/landing"
    val scd     = s"$dir/scd"
    import spark.implicits._
    val Seq(b1, b2, b3) = slices(3)

    b1.toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("append").parquet(landing)
    val q1 = StreamingScd2.ingest(spark, landing, scd, s"$dir/ckpt", maxFilesPerTrigger = Some(1))
    try {
      q1.processAllAvailable()
      assert(StreamingScd2.currentVersion(spark, scd) === Some(1))
      // v=1 equals the batch build over batch-1 rows alone
      assert(
        histRows(StreamingScd2.history(spark, scd)) ===
          histRows(graft.operators.Relational2.scd2History(
            b1.toDF("user_id", "ts", "event_id", "event_type"))),
        "v=1 equals the batch derivation on the first slice")
      b2.toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(landing)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(StreamingScd2.currentVersion(spark, scd) === Some(2))

    // restart from the same checkpoint; the third slice folds on top
    b3.toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("append").parquet(landing)
    val q2 = StreamingScd2.ingest(spark, landing, scd, s"$dir/ckpt", maxFilesPerTrigger = Some(1))
    try q2.processAllAvailable()
    finally q2.stop()
    assert(StreamingScd2.currentVersion(spark, scd) === Some(3))

    val union = (b1 ++ b2 ++ b3).toDF("user_id", "ts", "event_id", "event_type")
    assert(
      histRows(StreamingScd2.history(spark, scd)) ===
        histRows(graft.operators.Relational2.scd2History(union)),
      "post-restart history must equal the batch scd2History on the union")
    // fold-input accounting exists for every batch (the O(|hist|+|batch|)
    // bound is observable, not asserted)
    (0 to 2).foreach { b =>
      assert(new java.io.File(s"$scd/stats/batch_id=$b").exists, s"stats for batch $b")
    }
  }

  test("boundary collapse: a cross-batch no-change observation extends the open version") {
    val dir     = Files.createTempDirectory("streaming-scd2-boundary").toString
    val landing = s"$dir/landing"
    val scd     = s"$dir/scd"
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // batch 1: user 1 A (open version 1); batch 2 starts with the SAME
    // status A (must extend version 1, not open version 2), then B
    val b1 = Seq((1L, ts(100), 10L, "A"))
    val b2 = Seq((1L, ts(200), 11L, "A"), (1L, ts(300), 12L, "B"))
    b1.toDF("user_id", "ts", "event_id", "event_type").coalesce(1).write.mode("append").parquet(landing)
    val q = StreamingScd2.ingest(spark, landing, scd, s"$dir/ckpt", maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      b2.toDF("user_id", "ts", "event_id", "event_type").coalesce(1).write.mode("append").parquet(landing)
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamingScd2
      .history(spark, scd)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 1L, "A", 100L, 300L, 0L),
      (1L, 2L, "B", 300L, 9999999999L, 1L)
    ), s"the batch-2 'A' must extend version 1: ${got.toSeq}")
  }

  test("ordering contract: a late batch fails fast instead of diverging") {
    val dir     = Files.createTempDirectory("streaming-scd2-late").toString
    val landing = s"$dir/landing"
    val scd     = s"$dir/scd"
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq((1L, ts(500), 10L, "A")).toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("append").parquet(landing)
    val q = StreamingScd2.ingest(spark, landing, scd, s"$dir/ckpt", maxFilesPerTrigger = Some(1))
    try {
      q.processAllAvailable()
      // a LATE observation (before the folded watermark) must refuse
      Seq((2L, ts(100), 20L, "B")).toDF("user_id", "ts", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(landing)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage.contains("event-time order") || Option(ex.getCause).exists(
        c => String.valueOf(c.getMessage).contains("event-time order")),
        s"the failure must name the ordering contract: ${ex.getMessage}")
    } finally q.stop()
  }
}
