package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items state: at most k (item -> counter) entries.
  *
  * Classic MG update: a hit increments its counter; a miss inserts at
  * count 1 if a slot is free, else decrements EVERY counter (dropping
  * zeros) — "one miss cancels one occurrence of each tracked item".
  * Merge (Agarwal et al., "Mergeable Summaries", PODS 2012): add counts
  * pairwise, and if more than k survive, subtract the (k+1)-th largest
  * count from all and keep the positives — the merged summary keeps the
  * MG error bound, which is what makes the aggregate safe as a Spark
  * partial aggregation.
  *
  * Deficit accounting: `deficit` accumulates the total weight ever
  * subtracted by decrements/merge-trims. The MG guarantee is
  *   true_count - deficit <= est <= true_count, with deficit <= n/(k+1)
  * — so every item with true frequency above n/(k+1) is present, and the
  * sketch REPORTS its own worst-case error instead of asking the caller
  * to trust the formula (the no-silent-caps rule applied to a sketch).
  */
final class MgState(val k: Int) {
  val counts  = new java.util.HashMap[String, Long](k * 2)
  var deficit = 0L

  def update(item: String): Unit = {
    val c = counts.get(item)
    if (c != 0L) counts.put(item, c + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // miss with a full table: decrement all, drop zeros
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
      deficit += 1L
    }
  }

  def mergeWith(o: MgState): MgState = {
    val out = new MgState(k)
    out.deficit = deficit + o.deficit
    out.counts.putAll(counts)
    o.counts.forEach((item, c) => out.counts.merge(item, c, (a, b) => a + b))
    if (out.counts.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val vals = new Array[Long](out.counts.size)
      var i    = 0
      val vit  = out.counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val it  = out.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
      out.deficit += cut
    }
    out
  }
}

/** `freq_items(item, k)` — mergeable Misra-Gries heavy-hitters sketch over
  * a string column. Returns `array<struct<item string, est bigint>>`
  * sorted by (est desc, item), PLUS the error bound the caller needs:
  * every estimate undercounts by at most [[MgState.deficit]], exposed as a
  * final `("", deficit)` sentinel row so one aggregation output carries
  * both the items and their worst-case error. (Callers whose item domain
  * can contain the empty string must pre-filter or remap it — the token
  * queries never produce one.)
  *
  * Scale: a [[TypedImperativeAggregate]] — map-side partial aggregation
  * keeps at most k entries per group, the shuffle carries
  * O(groups x k x partitions), merge is O(k log k). The INTENDED pattern
  * at 100 TB is sketch-then-verify: the sketch's guarantee (any item with
  * true count > n/(k+1) is present) prunes the candidate set, and one
  * cheap semi-join + exact count over the candidates turns the
  * approximate sketch into an EXACT heavy-hitters report — see
  * `q_text_heavyhitters`, whose final output is deterministic (and
  * DuckDB-hash-checked) even though the sketch itself is partition-order
  * dependent.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MgState]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"freq_items expects string, got ${child.dataType.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"freq_items needs k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgState = new MgState(k)

  override def update(buf: MgState, input: InternalRow): MgState = {
    val v = child.eval(input)
    // toString copies out of Spark's reused UTF8String buffer
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgState, other: MgState): MgState = buf.mergeWith(other)

  override def eval(buf: MgState): Any = {
    val entries = new java.util.ArrayList(buf.counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue, a.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val out = new Array[Any](entries.size + 1)
    var i   = 0
    while (i < entries.size) {
      val e = entries.get(i)
      out(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    out(i) = InternalRow(UTF8String.fromString(""), buf.deficit) // error sentinel
    new GenericArrayData(out)
  }

  override def serialize(buf: MgState): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val out  = new java.io.DataOutputStream(baos)
    out.writeLong(buf.deficit)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (item, c) =>
      val bytes = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    baos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgState = {
    val in  = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgState(k)
    buf.deficit = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = FreqItems.outputType
  override def nullable: Boolean  = false
  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

object FreqItems {

  val outputType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false
  )

  /** Registry builder: `freq_items(item, k)` with a foldable k. */
  def build(exprs: Seq[Expression]): Expression = {
    Arity.require("freq_items", "2 (freq_items(item, k))", exprs, 2, 2)
    val kExpr = exprs(1)
    require(kExpr.foldable, "freq_items k must be a literal")
    FreqItemsAgg(exprs.head, kExpr.eval().asInstanceOf[Number].intValue())
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("freq_items", build, "built-in")
}
