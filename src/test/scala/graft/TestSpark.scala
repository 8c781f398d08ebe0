package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test/fork gives one JVM). */
object TestSpark {
  lazy val spark: SparkSession = Tables.localSession("graft-test", "4")
  val sfDir = "/root/testdata/sf0.001"
}
