package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary (round-9 postmortem): the driver regenerates the
  * parquet fixtures between rounds and has already shipped two different
  * physical encodings of `events.ts` (TIMESTAMP(NANOS) → LONG under
  * `nanosAsLong`, then TIMESTAMP(MICROS) → TIMESTAMP_NTZ). A drift used to
  * surface as 36 scattered failures across 5 suites; this spec forces every
  * loader to ANALYZE against every sf dir so the next drift fails exactly
  * one named test with the table and dir in the failure message.
  */
class TablesSchemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  test("every fixture loader analyzes against every sf dir") {
    assert(sfDirs.nonEmpty, "no test fixture dirs found under /root/testdata")
    for (dir <- sfDirs; name <- Tables.tableNames) {
      val df =
        try {
          if (name == "events") Tables.events(spark, dir)
          else {
            // go through registerViews' path for the generic tables
            Tables.registerViews(spark, dir)
            spark.table(name)
          }
        } catch {
          case e: Throwable =>
            fail(s"loader for table '$name' failed to analyze against $dir: ${e.getMessage}", e)
        }
      // force full analysis (schema alone can be lazy for views)
      assert(df.schema.fieldNames.nonEmpty, s"$name@$dir has empty schema")
      assert(df.queryExecution.analyzed != null, s"$name@$dir failed analysis")
    }
  }

  test("events.ts surfaces as TIMESTAMP regardless of the fixture's physical type") {
    for (dir <- sfDirs) {
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType, s"events.ts@$dir is $dt, expected TIMESTAMP")
    }
  }

  test("fixture content shape holds: props has $.k, docs tokenize, embeddings are uniform") {
    import org.apache.spark.sql.functions._
    // the content assumptions 20+ queries bake in — if the driver
    // regenerates fixtures with a different JSON key / empty text /
    // ragged embedding dims, THIS fails by name instead of a query wall
    for (dir <- sfDirs.take(2)) {
      val kNonNull = Tables
        .events(spark, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .count()
      assert(kNonNull > 0, s"events.props@$dir no longer carries a numeric $$.k key")

      val docRow = Tables
        .documents(spark, dir)
        .agg(
          sum((size(split(col("text"), " ")) >= 2).cast("long")).as("multi_token"),
          count(lit(1)).as("n")
        )
        .head()
      assert(docRow.getLong(0) > docRow.getLong(1) / 2, s"documents.text@$dir no longer tokenizes on spaces")

      val dims = Tables.embeddings(spark, dir).select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
      assert(dims.length == 1 && dims.head > 0, s"embeddings@$dir dims not uniform: ${dims.toSeq}")
    }
  }

  test("events.ts epoch emission is stable across sf dirs (sanity on real data)") {
    // epoch seconds must be in a plausible range (the fixtures are 2023-24
    // era synthetic events) — catches unit mistakes (ns-as-s would be year
    // ~56k, s-as-us would be 1970) without pinning exact fixture content
    for (dir <- sfDirs.take(1)) {
      import org.apache.spark.sql.functions._
      val row = Tables
        .events(spark, dir)
        .agg(min(unix_timestamp(col("ts"))).as("lo"), max(unix_timestamp(col("ts"))).as("hi"))
        .head()
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      assert(lo > 631152000L, s"events.ts min epoch $lo implausibly early (unit bug?)") // 1990-01-01
      assert(hi < 4102444800L, s"events.ts max epoch $hi implausibly late (unit bug?)") // 2100-01-01
    }
  }
}
