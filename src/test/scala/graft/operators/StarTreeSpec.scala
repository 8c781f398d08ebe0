package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The star-tree pre-agg must (a) answer any dimension subset identically
  * to aggregating the base table and (b) touch only its slice's files.
  */
class StarTreeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dims    = Seq("o_orderstatus", "o_orderpriority")
  private val metrics = Seq("o_totalprice")

  private def cubeDir: String = StarTree.cubeDirFor(spark, TestSpark.sfDir)

  private def direct(subset: Seq[String]) =
    Tables
      .orders(spark, TestSpark.sfDir)
      .groupBy(subset.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_o_totalprice")
      )

  test("every subset of dims answers identically to direct aggregation") {
    for (subset <- Seq(Seq("o_orderstatus"), Seq("o_orderpriority"), dims, Seq.empty)) {
      val pre = StarTree
        .query(spark, cubeDir, dims, subset, metrics)
        .collect()
        .map(r => r.toSeq.map(String.valueOf))
        .toSet
      val base = direct(subset).collect().map(r => r.toSeq.map(String.valueOf)).toSet
      assert(pre === base, s"subset $subset")
    }
  }

  test("a slice query partition-prunes to one grouping id") {
    val df = StarTree.query(spark, cubeDir, dims, Seq("o_orderstatus"), metrics)
    val formatted =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the _gid predicate must land in PartitionFilters (pruned at planning),
    // never in PushedFilters/data filters (which would scan every slice)
    val pf = formatted.linesIterator.find(_.trim.startsWith("PartitionFilters:")).getOrElse("")
    assert(pf.contains("_gid"), s"grouping-id filter must prune partitions:\n$formatted")
    // and the scan reports exactly one selected slice directory
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(
      scans.head.metadata.get("Location").forall(_.contains("graft-startree")),
      "must read the materialized cube, not the base table"
    )
  }
}
