package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Blocked-free classic Bloom filter over string keys, built as a MERGEABLE
  * Spark aggregate and probed by a codegen scalar expression.
  *
  * Why this exists (the 100 TB decontamination shape): the standard
  * production decontamination path (GPT-3 appendix C / Dolma) builds a
  * filter over the SMALL side (benchmark/test n-grams — millions of keys,
  * a few MB of bits) and streams the HUGE side through a map-side
  * membership probe. No shuffle ever touches the big side; only probable
  * hits (true hits + an fpp-bounded trickle of false positives) proceed to
  * an exact verify join. `q_contamination_bloom` wires exactly that:
  * bloom prefilter -> broadcast exact verify, end-to-end hash-exact.
  *
  * Design choices:
  *   - the SERIALIZED filter is self-describing: an 8-byte header (magic
  *     "GBF", version, numHashes, 3 reserved zero bytes) precedes the
  *     little-endian bit words, and the probe reads k FROM the header. A
  *     raw-bits format would make a build/probe k mismatch silently
  *     produce FALSE NEGATIVES (probing bits the build never set) — in a
  *     decontamination prefilter that means contamination slipping
  *     through undetected; Spark's own BloomFilterImpl serializes
  *     version+numHashes for the same reason. Two filters built with the
  *     same sizing still OR-combine with a plain byte-wise OR: identical
  *     headers OR to themselves.
  *   - bits are `Array[Long]` words; `m` is rounded up to a multiple of 64.
  *   - double hashing (Kirsch-Mitzenmacher 2006): two 32-bit Murmur3 hashes
  *     of the UTF-8 bytes (seeds 0xA5F1 and 0x9E37) combine as
  *     `h1 + i*h2` for the i-th probe — k independent hash families are
  *     unnecessary for the fpp bound, and both the interpreted and codegen
  *     paths call the same public static `Murmur3_x86_32.hashUnsafeBytes`
  *     Spark uses for its own hash exprs.
  *   - the aggregate buffer is the word array itself: update sets k bits
  *     in place (no per-row allocation), merge is a word-wise OR — the
  *     partial-aggregation contract, so a 1000-executor build sends one
  *     filter per partition up the tree, never the keys.
  *   - NO distinct is needed upstream (inserts are idempotent) — building
  *     over raw exploded n-grams skips the pre-shuffle a set-join needs.
  *
  * Sizing: optimal bits/key for target fpp p is ln(p)/ln(0.6185) ~
  * 1.44*log2(1/p); k = round(0.693 * bits/key). [[BloomFilter.suggest]]
  * computes both from (expectedKeys, fpp).
  */
object BloomFilter {

  private val Seed1 = 0xa5f1
  private val Seed2 = 0x9e37

  /** Serialized-filter header: magic "GBF" + version byte, then numHashes,
    * then 3 reserved zero bytes (8 total keeps the bit words 8-aligned).
    */
  val HeaderLen = 8
  private val Magic   = Array[Byte]('G', 'B', 'F')
  private val Version = 1.toByte

  def header(numHashes: Int): Array[Byte] = {
    require(numHashes >= 1 && numHashes <= MaxHashes, s"numHashes out of range: $numHashes")
    Array[Byte](Magic(0), Magic(1), Magic(2), Version, numHashes.toByte, 0, 0, 0)
  }

  /** numHashes recovered from a serialized filter; throws on anything that
    * is not a version-1 graft bloom (a truncated buffer, raw bits from an
    * older build, or a foreign format must fail loudly, not probe wrong
    * bit positions).
    */
  def numHashesOf(bytes: Array[Byte]): Int = {
    require(
      bytes.length >= HeaderLen && bytes.length % 8 == 0 &&
        bytes(0) == Magic(0) && bytes(1) == Magic(1) && bytes(2) == Magic(2),
      s"not a graft bloom filter (len=${bytes.length})")
    require(bytes(3) == Version, s"unsupported bloom version ${bytes(3)} (expected $Version)")
    val k = bytes(4).toInt
    require(k >= 1 && k <= MaxHashes, s"corrupt bloom header: numHashes=$k")
    k
  }

  /** Upper bound on k accepted by build and probe. Optimal k = ln(2)*m/n
    * exceeds 16 only below fpp ~1e-5 — sizes where the prefilter+verify
    * pattern gains nothing over 16 (the verify join removes the residue
    * either way).
    */
  val MaxHashes = 16

  /** (numBits, numHashes) for an expected key count and target fpp. Both
    * returned values are always accepted by [[BloomAgg]]: numBits is a
    * positive multiple of 64 capped at the largest such value fitting Int
    * (the naive round-up of a near-Int.MaxValue m would wrap negative),
    * and k is clamped to [1, MaxHashes].
    */
  def suggest(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom sizing ($expectedKeys, $fpp)")
    val maxBits = (Int.MaxValue.toLong / 64) * 64
    val bits    = math.ceil(-expectedKeys * math.log(fpp) / (math.log(2) * math.log(2)))
    val m       = math.min(maxBits.toDouble, math.max(64.0, bits)).toLong
    val mUp     = math.min(maxBits, ((m + 63) / 64) * 64)
    val k       = math.max(1L, math.min(MaxHashes.toLong, math.round(0.6931 * mUp / expectedKeys))).toInt
    (mUp.toInt, k)
  }

  /** Set the k probe bits of `key` in `words`. Static-shaped so the
    * aggregate's update is allocation-free.
    */
  def add(words: Array[Long], numBits: Int, numHashes: Int, key: UTF8String): Unit = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, Seed1)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, Seed2)
    var i = 0
    while (i < numHashes) {
      val combined = h1 + i * h2
      val idx      = java.lang.Math.floorMod(combined, numBits)
      words(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Membership probe against the SERIALIZED filter (header + little-endian
    * word bytes) — shared verbatim by the interpreted eval and (by name)
    * the generated code, so the two paths cannot drift. `numHashes` comes
    * from the filter's own header, so a build/probe k mismatch is
    * structurally impossible. False negatives are impossible;
    * false-positive rate follows the standard (1-e^{-kn/m})^k bound.
    */
  def mightContain(bytes: Array[Byte], key: UTF8String): Boolean = {
    val numHashes = numHashesOf(bytes)
    val numBits   = (bytes.length - HeaderLen) * 8
    if (numBits == 0) return false
    val h1 = Murmur3_x86_32.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, Seed1)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, Seed2)
    var i = 0
    while (i < numHashes) {
      val combined = h1 + i * h2
      val idx      = java.lang.Math.floorMod(combined, numBits)
      if ((bytes(HeaderLen + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Word array -> serialized filter: header then little-endian bit words
    * (the aggregate's OUTPUT encoding; partial buffers shuffle as raw
    * words via [[toRawBytes]] — they never leave the aggregation tree).
    */
  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(HeaderLen + words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(header(numHashes))
    words.foreach(bb.putLong)
    bb.array()
  }

  /** Headerless word serialization for the PARTIAL-buffer shuffle (k is a
    * plan constant there; a header would be 8 dead bytes per partial).
    */
  def toRawBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromRawBytes(bytes: Array[Byte]): Array[Long] = {
    val bb  = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Registry builder: `bloom_agg(key, numBits, numHashes)` (foldable sizes). */
  def aggBuild(exprs: Seq[Expression]): Expression = {
    Arity.require("bloom_agg", "3 (bloom_agg(key, numBits, numHashes))", exprs, 3, 3)
    require(exprs(1).foldable && exprs(2).foldable, "bloom_agg sizes must be literals")
    BloomAgg(
      exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue()
    )
  }

  /** Registry builder: `bloom_might_contain(bloom_bytes, key)` — numHashes
    * travels INSIDE the filter bytes (see [[header]]); a separate argument
    * would reintroduce the silently-mismatched-k false-negative mode.
    */
  def probeBuild(exprs: Seq[Expression]): Expression = {
    Arity.require("bloom_might_contain", "2 (bloom_might_contain(bloom_bytes, key))", exprs, 2, 2)
    BloomMightContain(exprs.head, exprs(1))
  }

  /** Register both functions for `expr(...)`/SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bloom_agg", aggBuild, "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain", probeBuild, "built-in")
  }
}

/** The distributed filter build: one `Array[Long]` bit buffer per partial
  * buffer, OR-merge up the aggregation tree, binary output. Only the
  * partial-buffer shuffle (serialize/deserialize) uses the raw-word bit
  * encoding; `eval` prefixes the final bytes with the 8-byte
  * self-describing header (magic + version + numHashes — see
  * [[BloomFilter.header]]), and the probe reads k from that header
  * rather than taking it as an argument. Two filters built with the same
  * sizing AND the same k still OR-combine downstream (byte-wise OR of the
  * bit region behind identical headers) — no re-aggregation needed to
  * union corpora.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"bloom_agg expects string key, got ${child.dataType.sql}")
    else if (numBits < 64 || numBits % 64 != 0)
      TypeCheckResult.TypeCheckFailure(s"bloom_agg numBits must be a positive multiple of 64, got $numBits")
    else if (numHashes < 1 || numHashes > BloomFilter.MaxHashes)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg numHashes must be in [1,${BloomFilter.MaxHashes}], got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.add(buf, numBits, numHashes, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomFilter.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte]     = BloomFilter.toRawBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilter.fromRawBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean  = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(bloom_bytes, key)` with whole-stage codegen: the
  * generated code calls the same static [[BloomFilter.mightContain]] the
  * interpreted path uses (one virtual-call-free static invoke per row; the
  * hash itself is the Murmur3 intrinsic Spark's own hash exprs compile to).
  * The filter bytes are typically a broadcast literal (`lit(bytes)`), so
  * codegen hoists them into a reference object — zero per-row decode.
  *
  * numHashes is read from the filter's own header ([[BloomFilter.header]]):
  * the build writes k into the bytes it emits, so the probe structurally
  * cannot disagree with the build — the spec pins the round-trip and the
  * header-validation failure modes.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects binary filter, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects string key, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomFilter.mightContain(bloom.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (bloom, key) =>
        s"${ev.value} = graft.functions.BloomFilter.mightContain($bloom, $key);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
