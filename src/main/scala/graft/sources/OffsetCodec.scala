package graft.sources

/** Long offset codec for the partitioned event stream.
  *
  * The reference flattens Pulsar's `MessageId(ledgerId, entryId)` cursor into
  * one monotonically increasing long — `(ledgerId << 28) | entryId` — and
  * splits it back with `ledgerId = offset >>> 28; entryId = offset &
  * 0x0FFFFFFF` (reference: `MessageIdUtils.java:25-43`). The "next position"
  * rule is `offset + 1` (`MessageAndOffset.java:46-48`).
  *
  * Semantic quirks preserved on purpose (SURVEY §1.1.2):
  *   - Offsets are NOT dense: a ledger rollover jumps the encoded value, so
  *     `offset + 1` may address a nonexistent entry. Consumers must treat a
  *     start offset as "first entry at-or-after", never as arithmetic truth.
  *   - Producer-side batches share one `(ledgerId, entryId)`, so distinct
  *     messages may collapse to the same offset (the reference discards the
  *     batch index, `MessageIdUtils.java:26`; batch-index ack is disabled at
  *     `PulsarPartitionLevelConsumer.java:67`).
  *
  * In the Spark rebuild these longs live inside the checkpointed
  * [[org.apache.spark.sql.connector.read.streaming.Offset]] of the
  * micro-batch source (exclusive-end ranges), so non-density is harmless:
  * ranges are planned from observed offsets, not by incrementing.
  */
object OffsetCodec {

  /** Entry-id field width in bits (reference `MessageIdUtils.java:30-33`:
    * 28 bits chosen against ledger rollover).
    */
  val EntryBits: Int = 28
  val EntryMask: Long = (1L << EntryBits) - 1 // 0x0FFFFFFF

  /** `MessageId(ledgerId, entryId)` -> long. Mirrors `MessageIdUtils.java:33`. */
  def encode(ledgerId: Long, entryId: Long): Long =
    (ledgerId << EntryBits) | (entryId & EntryMask)

  /** long -> `(ledgerId, entryId)`. Mirrors `MessageIdUtils.java:39-40`. */
  def decode(offset: Long): (Long, Long) =
    (offset >>> EntryBits, offset & EntryMask)

  def ledgerId(offset: Long): Long = offset >>> EntryBits
  def entryId(offset: Long): Long  = offset & EntryMask

  /** Exclusive-end / resume rule (`MessageAndOffset.java:46-48`). */
  def next(offset: Long): Long = offset + 1

  /** Sentinel used by the reference for "start from the earliest available
    * message" (`PulsarPartitionLevelConsumer.java:123`: `-1` ->
    * `MessageId.earliest`).
    */
  val Earliest: Long = -1L
}
