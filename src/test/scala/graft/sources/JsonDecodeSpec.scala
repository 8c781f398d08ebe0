package graft.sources

import graft.TestSpark
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Decode semantics of the reference (`PulsarJSONMessageDecoder.java:61-73`,
  * FIXTURES.md §A payload cases): drop malformed, null missing fields,
  * project extras away, never throw.
  */
class JsonDecodeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(
    Seq(StructField("user_id", LongType), StructField("event_type", StringType))
  )

  private def decodeAll(payloads: Seq[(Long, String)]) =
    JsonDecode.decode(
      payloads.toDF("offset", "payload"),
      "payload",
      schema,
      Seq("user_id", "event_type"),
      Seq("offset")
    )

  test("flat object, all fields present") {
    val out = decodeAll(Seq((1L, """{"user_id": 7, "event_type": "click"}"""))).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 7L)
    assert(out(0).getString(2) === "click")
  }

  test("extra fields beyond fieldsToRead projected away") {
    val out = decodeAll(Seq((1L, """{"user_id": 7, "event_type": "x", "junk": [1,2]}""")))
    assert(out.columns.toSeq === Seq("offset", "user_id", "event_type"))
    assert(out.count() === 1)
  }

  test("missing fields -> null in row (row kept)") {
    val out = decodeAll(Seq((1L, """{"user_id": 7}"""))).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(2))
  }

  test("malformed payloads dropped, not failed (truncated + non-JSON)") {
    val out = decodeAll(
      Seq(
        (1L, """{"user_id": 1, "event_type": "ok"}"""),
        (2L, "not json at all"),
        (3L, """{"user_id": 3, "event_ty"""),
        (4L, "")
      )
    ).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("variant decode path (q_json_variant shape): malformed doc nulls out and is counted, not thrown") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      """{"k": 3}""",
      """{"other": 1}""", // well-formed, key missing
      """{"k": """,       // truncated
      "not json"
    ).toDF("props")
    val out = rows
      .select(expr("try_parse_json(props)").as("v"))
      .select(expr("variant_get(v, '$.k', 'bigint')").as("k_val"), col("v").isNull.cast("long").as("malformed"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k_val")).as("sum_k"),
        sum(col("k_val").isNull.cast("long")).as("n_missing"),
        sum(col("malformed")).as("n_malformed")
      )
      .collect()
      .head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) === ((4L, 3L, 3L, 2L)))
  }

  test("nested object/array values tolerated when typed as such") {
    val nested = StructType(
      Seq(
        StructField("user_id", LongType),
        StructField("tags", org.apache.spark.sql.types.ArrayType(StringType))
      )
    )
    val out = JsonDecode
      .decode(
        Seq((1L, """{"user_id": 5, "tags": ["a", "b"]}""")).toDF("offset", "payload"),
        "payload",
        nested,
        Seq("user_id", "tags"),
        Seq("offset")
      )
      .collect()
    assert(out(0).getSeq[String](2) === Seq("a", "b"))
  }

  test("decode drops are measurable via observe() (SURVEY §7.5.3 metric channel)") {
    val observed = JsonDecode
      .decodeCounted(
        Seq((1L, """{"user_id": 1}"""), (2L, "garbage"), (3L, "also garbage")).toDF("offset", "payload"),
        "payload",
        schema,
        Seq("user_id"),
        Seq("offset")
      )
      .observe(
        "decode_metrics",
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("_corrupt").cast("long")).as("n_corrupt"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n_total")
      )
    observed.collect()
    val m = observed.queryExecution.observedMetrics("decode_metrics")
    assert(m.getAs[Long]("n_corrupt") === 2L)
    assert(m.getAs[Long]("n_total") === 3L)
  }

  test("decodeCounted flags corrupt rows instead of dropping") {
    val out = JsonDecode
      .decodeCounted(
        Seq((1L, """{"user_id": 1}"""), (2L, "garbage")).toDF("offset", "payload"),
        "payload",
        schema,
        Seq("user_id"),
        Seq("offset")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(2))
      .toMap
    assert(out === Map(1L -> false, 2L -> true))
  }
}
