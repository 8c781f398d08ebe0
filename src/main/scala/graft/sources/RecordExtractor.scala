package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The config-driven pluggable decode seam (S16): a decode hook selected BY
  * CLASS NAME in table/source config, so a deployment swaps decoders
  * without code changes — the reference resolves `RECORD_EXTRACTOR_CONFIG_KEY`
  * from stream props and loads the named class through its plugin manager,
  * defaulting to the stock JSON extractor
  * (`PulsarJSONMessageDecoder.java:50-57`).
  *
  * Spark wiring: pass `.option("recordExtractorClass", <fqcn>)` to the
  * `graft-events` source. The scan schema becomes
  * `(partition, offset) ++ extractor.schema` and each partition reader
  * decodes executor-side, dropping messages the extractor rejects — the
  * reference's drop-on-malformed contract (`decode()` returning null,
  * `PulsarJSONMessageDecoder.java:61-73`).
  *
  * Implementations need a public zero-arg constructor. They are
  * instantiated independently on the driver (for the schema) and once per
  * partition reader (for decode), so there is NO serializability
  * requirement — only the class name crosses the wire, exactly like the
  * reference's by-name plugin loading.
  */
trait RecordExtractor {

  /** Decoded fields, appended after the (partition, offset) envelope. */
  def schema: StructType

  /** Called once per partition reader, before any [[extract]], with the
    * subset of [[schema]] field names the query actually reads — DSv2
    * column pruning delivering the reference's
    * `extractor.init(fieldsToRead)` hint
    * (`PulsarJSONMessageDecoder.java:57-58`). Rows must still match
    * [[schema]]'s arity; un-requested fields may decode as null (the scan
    * drops them anyway). Default ignores the hint.
    */
  def init(fieldsToRead: Seq[String]): Unit = ()

  /** Decode one message payload into external Spark row values matching
    * [[schema]] (missing fields as null). `None` drops the message.
    */
  def extract(payload: Array[Byte]): Option[Row]
}

object RecordExtractor {

  /** Source option naming the extractor class (reference
    * `RECORD_EXTRACTOR_CONFIG_KEY`).
    */
  val OptionKey = "recordExtractorClass"

  /** By-name instantiation — the `PluginManager.createInstance` analogue.
    * Fails loudly on a missing class or a class that is not a
    * [[RecordExtractor]]; a typo'd decoder must never silently fall back
    * to raw bytes.
    */
  def instantiate(className: String): RecordExtractor =
    Class.forName(className).getDeclaredConstructor().newInstance() match {
      case r: RecordExtractor => r
      case other =>
        throw new IllegalArgumentException(
          s"${other.getClass.getName} does not implement graft.sources.RecordExtractor"
        )
    }
}

/** Stock JSON extractor for the events payload shape — the
  * `JSONRecordExtractor` default of the reference seam. Jackson (already on
  * the Spark classpath) parses the payload; a malformed document drops the
  * message, a missing field decodes as null — the same accounting as
  * [[JsonDecode]], but running INSIDE the source scan so the decoded frame
  * needs no downstream decode step.
  */
class JsonEventExtractor extends RecordExtractor {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

  private val mapper = new ObjectMapper()

  override val schema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)
    )
  )

  // fieldsToRead honored: un-requested fields skip their JsonNode lookup
  // and decode as null (the pruned scan drops them regardless)
  private var wanted: Set[String] = schema.fieldNames.toSet
  override def init(fieldsToRead: Seq[String]): Unit = wanted = fieldsToRead.toSet

  private def longAt(n: JsonNode, f: String): Any = {
    val v = n.get(f)
    if (v == null || v.isNull || !v.canConvertToLong) null else v.asLong()
  }

  private def strAt(n: JsonNode, f: String): Any = {
    val v = n.get(f)
    if (v == null || v.isNull) null else v.asText()
  }

  private def dblAt(n: JsonNode, f: String): Any = {
    val v = n.get(f)
    if (v == null || v.isNull || !v.isNumber) null else v.asDouble()
  }

  override def extract(payload: Array[Byte]): Option[Row] =
    try {
      val n = mapper.readTree(payload)
      if (n == null || !n.isObject) None
      else
        Some(
          Row(
            if (wanted("event_id")) longAt(n, "event_id") else null,
            if (wanted("user_id")) longAt(n, "user_id") else null,
            if (wanted("event_type")) strAt(n, "event_type") else null,
            if (wanted("value")) dblAt(n, "value") else null
          )
        )
    } catch { case scala.util.control.NonFatal(_) => None }
}
