package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON payload decode with the reference's semantics
  * (`PulsarJSONMessageDecoder.java:61-73`):
  *
  *   - bytes -> JSON -> row against an externally supplied schema
  *     (the host's `fieldsToRead`, `PulsarJSONMessageDecoder.java:48`);
  *   - malformed payloads are DROPPED, never failed — the reference catches
  *     every decode exception, logs, and returns null (`:69-72`);
  *   - a payload that parses but misses fields keeps its row with nulls
  *     (extractor behavior: missing field -> null in `GenericRow`);
  *   - only the requested fields land in the row (projection via the record
  *     extractor, `:58`) — here a `select`, which Catalyst pushes into the
  *     JSON parser (schema pruning).
  *
  * Malformed vs merely-sparse input is distinguished with
  * `columnNameOfCorruptRecord`: PERMISSIVE `from_json` yields an all-null
  * struct for corrupt input — indistinguishable from a valid `{}` — so the
  * corrupt-record side channel is the only codegen-friendly way to get
  * drop-on-malformed exactly. Everything stays inside whole-stage codegen —
  * no UDFs on the 100 TB hot path.
  *
  * Where the reference only logs the dropped payload, at scale silent data
  * loss must be *measurable*: [[decodeCounted]] keeps a `_corrupt` flag the
  * caller can `observe()` or aggregate before the drop filter (SURVEY §7.5.3).
  */
object JsonDecode {

  /** Corrupt-record sentinel field. Known limitation (inherent to Spark's
    * columnNameOfCorruptRecord mechanism): a well-formed payload that itself
    * contains a top-level key with this exact name is misclassified as
    * corrupt and dropped. The name is chosen to make a collision with real
    * data effectively impossible; callers with hostile inputs can audit
    * drops via [[decodeCounted]].
    */
  private val CorruptCol = "__graft_corrupt_record__"

  private def schemaWithCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  /** Parse a binary/string JSON column into a struct column whose
    * `_graft_corrupt` field is non-null iff the payload failed to parse.
    */
  def parsed(payload: Column, schema: StructType): Column =
    from_json(
      payload.cast("string"),
      schemaWithCorrupt(schema),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    )

  /** Decode `payloadCol` in `df` against `schema`, keep only `fields`
    * (decoded) plus `passthrough` (envelope columns, e.g. offset/partition),
    * dropping rows whose payload failed to parse.
    */
  def decode(
      df: DataFrame,
      payloadCol: String,
      schema: StructType,
      fields: Seq[String],
      passthrough: Seq[String] = Seq.empty
  ): DataFrame = {
    val selected = fields.filter(schema.fieldNames.contains)
    // drop when the payload is null/empty (from_json yields a null struct —
    // Jackson would throw on empty input) OR flagged corrupt
    df.withColumn("_decoded", parsed(col(payloadCol), schema))
      .filter(col("_decoded").isNotNull && col(s"_decoded.$CorruptCol").isNull)
      .select(passthrough.map(col) ++ selected.map(f => col(s"_decoded.$f")): _*)
  }

  /** Like [[decode]] but keeps a `_corrupt` boolean instead of dropping, so
    * callers can count drops (e.g.
    * `df.observe("decode", sum(when($"_corrupt", 1)))`) before filtering.
    */
  def decodeCounted(
      df: DataFrame,
      payloadCol: String,
      schema: StructType,
      fields: Seq[String],
      passthrough: Seq[String] = Seq.empty
  ): DataFrame = {
    val selected = fields.filter(schema.fieldNames.contains)
    df.withColumn("_decoded", parsed(col(payloadCol), schema))
      .select(
        passthrough.map(col) ++
          selected.map(f => col(s"_decoded.$f")) :+
          (col("_decoded").isNull || col(s"_decoded.$CorruptCol").isNotNull).as("_corrupt"): _*
      )
  }
}
