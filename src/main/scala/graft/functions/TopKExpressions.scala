package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** A bounded top-k selection summary: keeps the k best (ord, tag) pairs
  * under the total order (ord DESC, tag ASC) — the same order
  * `row_number() OVER (ORDER BY ord DESC, tag ASC) <= k` ranks by, with
  * `tag` a unique row id making the selection deterministic.
  *
  * Mergeability is trivial (union then re-trim to k: selection under a
  * total order is associative and commutative), which is the entire
  * point: as a [[TypedImperativeAggregate]] buffer it rides Spark's
  * partial-aggregation machinery, so each map task ships AT MOST k pairs
  * per group through the shuffle and no group is ever materialized or
  * sorted whole. One semantic footnote for streaming consumers: unlike
  * a register-max sketch, selection is NOT replay-idempotent — a
  * replayed row that still ranks in the top k is inserted again and the
  * answer would list it twice — so the aggregate assumes an
  * exactly-once source (Spark's checkpointed file/offset tracking — the
  * s14 restart e2e pins this), not at-least-once replay. The window-rank formulation of the same query shuffles
  * every row of every group and sort-spills the biggest group on one
  * reducer — at 100 TB with skewed groups that single difference is the
  * job. The heap keeps per-row cost at O(log k) with k·16 bytes of state
  * per (group × task). */
final class TopKBuffer(val k: Int) extends Serializable {
  require(k > 0, s"TopKBuffer needs k > 0, got $k")
  // min-heap under the ranking (head = worst retained pair): PriorityQueue
  // dequeues its ordering's maximum, so feed it the reversed ranking
  val heap: mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(TopKBuffer.better.reverse)

  def add(ord: Long, tag: Long): Unit =
    if (heap.size < k) heap.enqueue((ord, tag))
    else if (TopKBuffer.better.compare((ord, tag), heap.head) > 0) {
      heap.dequeue()
      heap.enqueue((ord, tag))
    }

  def merge(other: TopKBuffer): Unit =
    other.heap.foreach { case (o, t) => add(o, t) }

  /** Best-first (ord DESC, tag ASC) — rank i of the final answer. */
  def sortedBest: Array[(Long, Long)] =
    heap.toArray.sorted(TopKBuffer.better.reverse)

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (o, t) => out.writeLong(o); out.writeLong(t) }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  /** compare > 0 ⇔ a ranks strictly better than b (higher ord, ties to
    * the smaller tag). A total order because tags are unique. */
  val better: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  def deserialize(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readLong(), in.readLong()); i += 1 }
    b
  }
}

/** `topk_by(ord, tag, k)` → array<struct<ord, tag>> of the k best rows
  * per group under (ord DESC, tag ASC), best first. Rows with a null ord
  * or tag are skipped. Registered through [[graft.GraftExtensions]]. */
case class TopKByAgg(
    ord: Expression,
    tag: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = tag

  override def checkInputDataTypes(): TypeCheckResult =
    // k is validated here, not just in TopKBuffer's constructor: an
    // invalid k from SQL must fail at ANALYSIS time, not as a task-time
    // IllegalArgumentException on some executor
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"topk_by requires k >= 1, got $k")
    else (ord.dataType, tag.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (o, t) => TypeCheckResult.TypeCheckFailure(
        s"topk_by expects integral (ord, tag) columns, got ($o, $t)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("tag", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => // HARD CONTRACT: checkInputDataTypes admits exactly
      // Long/Int — widening the accepted types requires extending BOTH
      // that match and this one in the same change, never one side alone
      throw new IllegalStateException(
        s"topk_by: unsupported input value class ${other.getClass.getName}")
  }

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val t = tag.eval(input)
    if (o != null && t != null) buffer.add(asLong(o), asLong(t))
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBest.map { case (o, t) =>
      new GenericInternalRow(Array[Any](o, t)): Any
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByAgg =
    copy(ord = newLeft, tag = newRight)

  override def prettyName: String = "topk_by"
}

object TopKByAgg {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** DataFrame-API form: `df.agg(topkBy(col("n_chars"), col("doc_id"), 5))`. */
  def topkBy(ord: Column, tag: Column, k: Int): Column =
    GraftBridge.column(
      TopKByAgg(GraftBridge.expression(ord), GraftBridge.expression(tag), k)
        .toAggregateExpression())
}
