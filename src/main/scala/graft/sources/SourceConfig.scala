package graft.sources

/** Typed view over the flat `Map[String,String]` source options, mirroring
  * the reference's config surface (`PulsarPartitionLevelStreamConfig.java`):
  *
  *   - `stream.pulsar.broker.list`       — required (`:73-74`)
  *   - `stream.pulsar.consumer.maxBytes` — default 10 MiB (`:35-36`)
  *   - `stream.pulsar.consumer.maxMsgs`  — default 500 (`:37-38`)
  *   - `stream.pulsar.consumer.timeout`  — default 100 ms (`:39-40`)
  *
  * Parse rule preserved: a malformed integer silently falls back to the
  * default (`:97-107`) — the reference never fails ingestion over a config
  * typo, and neither do we.
  *
  * In the Spark source these bound each planned micro-batch per partition
  * (maxMsgs/maxBytes ≅ `maxOffsetsPerTrigger` style admission; timeout ≅
  * trigger interval), which is backpressure by construction — the same
  * physical tactic the reference gets from Pulsar's `BatchReceivePolicy`
  * (`PulsarPartitionLevelConsumer.java:69-73`).
  */
final case class SourceConfig(
    topic: String,
    brokers: String,
    maxBatchBytes: Int,
    maxBatchMessages: Int,
    batchTimeoutMillis: Int
)

object SourceConfig {
  val StreamType = "pulsar"

  val BrokerListKey = s"stream.$StreamType.broker.list"
  val MaxBytesKey   = s"stream.$StreamType.consumer.maxBytes"
  val MaxMsgsKey    = s"stream.$StreamType.consumer.maxMsgs"
  val TimeoutKey    = s"stream.$StreamType.consumer.timeout"
  val TopicKey      = s"stream.$StreamType.topic.name"

  val DefaultMaxBatchBytes: Int    = 10 * 1024 * 1024 // 10 MiB
  val DefaultMaxBatchMessages: Int = 500
  val DefaultTimeoutMillis: Int    = 100

  /** Int parse with silent default on malformed input — reference
    * `PulsarPartitionLevelStreamConfig.java:97-107`.
    */
  private[sources] def intOrDefault(raw: Option[String], default: Int): Int =
    raw match {
      case Some(s) =>
        try s.trim.toInt
        catch { case _: NumberFormatException => default }
      case None => default
    }

  def fromMap(options: Map[String, String]): SourceConfig = {
    val brokers = options.getOrElse(
      BrokerListKey,
      throw new IllegalArgumentException(s"$BrokerListKey is required")
    )
    SourceConfig(
      topic = options.getOrElse(TopicKey, ""),
      brokers = brokers,
      maxBatchBytes = intOrDefault(options.get(MaxBytesKey), DefaultMaxBatchBytes),
      maxBatchMessages = intOrDefault(options.get(MaxMsgsKey), DefaultMaxBatchMessages),
      batchTimeoutMillis = intOrDefault(options.get(TimeoutKey), DefaultTimeoutMillis)
    )
  }
}
