package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A Misra–Gries heavy-hitter summary with `k` counters and lazy
  * decrements (the classic debt trick: a global offset stands in for
  * "decrement every counter", so the per-item cost stays amortized O(1)
  * instead of O(k)).
  *
  * Guarantee (Misra–Gries 1982; merge bound from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after any sequence of adds and
  * merges totalling N occurrences, every item undercounts by at most
  * N/(k+1), so every item with true count > N/(k+1) is present in the
  * summary — one-sided, independent of partitioning and merge order.
  * That one-sided direction is the only fact [[graft.ops.Analytics]]'s
  * q27b verdict row depends on; the candidate set itself (like
  * `stat.freqItems`') is boundary-dependent and is never emitted.
  *
  * Why this exists next to `stat.freqItems`: Spark's builtin floors
  * support at 1e-4 (≤ 10k counters), so no guarantee below a 0.01%
  * share is expressible — measured and recorded in the README's q27
  * scaling leg. This aggregate takes any k, is a real partial-aggregate
  * (map-side combine, mergeable partials through the shuffle), and at
  * 100 TB costs k counters per task, not a second corpus pass. */
final class MGSummary(val k: Int) extends Serializable {
  require(k > 0, s"MGSummary needs k > 0, got $k")
  val counts = new mutable.HashMap[UTF8String, Long]
  /** Lazy global decrement: effective(x) = counts(x) − debt, always ≥ 1
    * for present keys (purge removes anything at or below the debt). */
  var debt = 0L

  /** One occurrence of `s`. The key is cloned on insert — the caller's
    * UTF8String may be a view into a reused unsafe row buffer. */
  def add(s: UTF8String): Unit = counts.get(s) match {
    case Some(c) => counts.update(s, c + 1L)
    case None =>
      if (counts.size < k) counts.update(s.clone(), debt + 1L)
      else {
        // classic MG full-map step: decrement all k counters and the
        // new item's implicit 1 → the item is absorbed, not inserted
        debt += 1L
        counts.filterInPlace((_, c) => c > debt)
      }
  }

  /** Weighted insert used by merge (effective weight from the other
    * summary). Inserting over capacity is allowed transiently; the
    * caller prunes back to k afterwards. */
  private def addWeight(s: UTF8String, w: Long): Unit = counts.get(s) match {
    case Some(c) => counts.update(s, c + w)
    case None => counts.update(s, debt + w)
  }

  /** Mergeable-summaries combine: add the other side's effective counts,
    * then if over capacity subtract the (k+1)-th largest effective count
    * from everything (one debt bump) and purge — error bounds add, the
    * one-sided guarantee survives any merge tree. */
  def merge(other: MGSummary): Unit = {
    other.counts.foreach { case (s, c) => addWeight(s, c - other.debt) }
    if (counts.size > k) {
      val effs = counts.valuesIterator.map(_ - debt).toArray
      java.util.Arrays.sort(effs)
      val cut = effs(effs.length - k - 1) // (k+1)-th largest effective
      debt += cut
      counts.filterInPlace((_, c) => c > debt)
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(counts.size)
    counts.foreach { case (s, c) =>
      val b = s.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c - debt)
    }
    out.flush(); bos.toByteArray
  }
}

object MGSummary {
  def deserialize(k: Int, bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val m = new MGSummary(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }
}

/** `freq_items_mg(str, k)` → map<string,bigint> of MG candidates with
  * their effective (under-)counts. Null inputs are skipped. Registered
  * through [[graft.GraftExtensions]]; the analyzer wraps the bare
  * AggregateFunction in an AggregateExpression. */
case class FreqItemsMG(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_items_mg expects string, got $t")
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buffer: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MGSummary, other: MGSummary): MGSummary = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MGSummary): Any = {
    val keys = new Array[Any](buffer.counts.size)
    val vals = new Array[Any](buffer.counts.size)
    var i = 0
    buffer.counts.foreach { case (s, c) =>
      keys(i) = s; vals(i) = c - buffer.debt; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buffer: MGSummary): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsMG =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsMG =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsMG =
    copy(child = newChild)

  override def prettyName: String = "freq_items_mg"
}

object FreqItemsMG {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** DataFrame-API form: `df.agg(freqItemsMg(col("t"), 50000))`. */
  def freqItemsMg(c: Column, k: Int): Column =
    GraftBridge.column(
      FreqItemsMG(GraftBridge.expression(c), k).toAggregateExpression())
}
