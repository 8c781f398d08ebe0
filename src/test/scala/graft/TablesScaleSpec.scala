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

  private def withMode(key: String, value: String)(body: => Unit): Unit =
    withModeValue(key, value)(body)

  private def withModeValue[T](key: String, value: String)(body: => T): T = {
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

  test("cluster pin modes: the iterative CC loop truncates lineage (pinIter) and matches local-mode labels") {
    import spark.implicits._
    // A lineage-RETAINING persist in this loop is structurally wrong: each
    // pointer-doubling round self-joins the previous frame, so round k's
    // logical plan carries 2^k copies of round 0's tree (reproduced: heap
    // OOM in the analyzer within ~8 rounds). pinIter must therefore
    // truncate every round — reliable checkpoint() under cluster modes.
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt-cc").toString)
    // a 30-node chain (worst-case diameter) plus a disjoint triangle
    val pairs = ((0L until 29L).map(i => (i, i + 1)) ++ Seq((100L, 101L), (101L, 102L)))
      .toDF("doc_a", "doc_b")
    def run(): Seq[(Long, Long)] =
      operators.Dedup
        .clusters(pairs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(identity)
        .toSeq
    val localLabels = run()
    val persistedLabels = withModeValue("spark.graft.pin.mode", "persist")(run())
    assert(persistedLabels === localLabels, "pin mode must never change results")
    assert(localLabels.filter(_._1 <= 29L).forall(_._2 == 0L), "chain collapses to min label")
    assert(localLabels.filter(_._1 >= 100L).forall(_._2 == 100L), "triangle collapses to min label")
  }

  test("pin persist mode: batchPsi equals local mode") {
    import spark.implicits._
    val bucket = streaming.StreamingPipelines.lengthBucket(col("len"))
    val ref    = Map(0L -> 0.5, 1L -> 0.5)
    val batch  = (Seq.fill(40)(10L) ++ Seq.fill(60)(250L)).toDF("len")
    def psi(): Double =
      streaming.StreamingPipelines.batchPsi(batch, ref, bucket).collect().head.getDouble(1)
    val a = psi()
    val b = withModeValue("spark.graft.pin.mode", "persist")(psi())
    assert(a === b)
  }

  test("pinIter reliable path: unpin reclaims the checkpoint files, not just the blocks") {
    import spark.implicits._
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt-reclaim").toString)
    withModeValue("spark.graft.pin.mode", "persist") {
      val pinned = Tables.pinIter(Seq(1L, 2L, 3L).toDF("id"))
      val ckptFile = pinned.queryExecution.analyzed
        .collect { case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getCheckpointFile }
        .flatten.headOption
      assert(ckptFile.isDefined, "cluster-mode pinIter with a checkpoint dir must checkpoint reliably")
      val dir = new java.io.File(new java.net.URI(ckptFile.get).getPath)
      assert(dir.exists, "checkpoint files must exist while pinned")
      Tables.unpin(pinned)
      assert(!dir.exists,
        "unpin must delete the round's checkpoint files — Spark's cleaner only reclaims at shutdown")
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
