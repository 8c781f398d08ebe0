package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two mode-gated scale seams in [[Tables]]:
  *
  *   - [[Tables.fanout]] must repartition starved fixture scans locally
  *     ("force", the local default) but be a no-op on an already-parallel
  *     input in "auto" mode — on a 100 TB corpus an unconditional
  *     repartition would shuffle the whole corpus before every explode.
  *   - [[Tables.pin]] must materialize once under every mode; "persist"
  *     keeps lineage (fault-tolerant on executor loss) where the local
  *     default truncates it.
  */
class TablesScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def dp = spark.sparkContext.defaultParallelism

  private def withMode(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("fanout force (local default): starved scan is spread to defaultParallelism") {
    val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    assert(Tables.fanout(one).rdd.getNumPartitions === dp)
  }

  test("fanout auto: no-op when the input already has enough splits, spreads when starved") {
    withMode("spark.graft.fanout.mode", "auto") {
      val wide = spark.range(0, 1000, 1, numPartitions = dp + 4).toDF("id")
      assert(Tables.fanout(wide).rdd.getNumPartitions === dp + 4,
        "auto must not shuffle an already-parallel input")
      val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      assert(Tables.fanout(one).rdd.getNumPartitions === dp,
        "auto must still rescue a starved scan")
    }
  }

  test("fanout off: identity") {
    withMode("spark.graft.fanout.mode", "off") {
      val one = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      assert(Tables.fanout(one).rdd.getNumPartitions === 1)
    }
  }

  test("pin persist mode: same rows, DISK_ONLY storage, lineage retained, unpin releases") {
    withMode("spark.graft.pin.mode", "persist") {
      val df = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
      val pinned = Tables.pin(df)
      assert(pinned.storageLevel === org.apache.spark.storage.StorageLevel.DISK_ONLY)
      assert(pinned.agg(sum(col("v"))).head().getLong(0) === 9900L)
      // lineage retained: the analyzed plan is still the original tree,
      // not a truncated LogicalRDD scan — executor loss can recompute
      assert(!pinned.queryExecution.analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
      Tables.unpin(pinned)
      assert(pinned.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    }
  }

  test("pin local mode (default): eager localCheckpoint semantics, unpin releases blocks") {
    val df     = spark.range(0, 50).toDF("id")
    val pinned = Tables.pin(df)
    assert(pinned.queryExecution.analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "local mode must truncate lineage (eager localCheckpoint)")
    assert(pinned.count() === 50L)
    Tables.unpin(pinned) // must not throw; blocks released asynchronously
  }
}
