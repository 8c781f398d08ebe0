package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must at least run at smoke scale; queries expected
  * to produce rows on the fixture must produce them. (Full value-level
  * verification is the driver's DuckDB gate, replayed locally by
  * scripts/verify_local.py.)
  */
class QueriesSmokeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Pair-finding queries legitimately return 0 rows on the dup-free fixture. */
  private val mayBeEmpty = Set("q_dedup_minhash_pairs", "q_dedup_simhash_dupes", "q_dedup_jaccard", "q_join_anti", "q_scan_project")

  SparkEntry.all.foreach { d =>
    test(s"${d.name} runs${if (mayBeEmpty(d.name)) "" else " and returns rows"}") {
      val n = d.build(spark, TestSpark.sfDir).count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key corresponds to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("query names are unique (a duplicate would silently shadow in the queries map)") {
    val names = SparkEntry.all.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }

  test("query names are unique") {
    assert(SparkEntry.all.map(_.name).distinct.size === SparkEntry.all.size)
  }
}
