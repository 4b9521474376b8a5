package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `theta_sketch(long_col, lgK)` → binary compact Theta sketch.
  *
  * Why a third distinct-sketch next to Spark's HLL pair: HLL union
  * answers "distinct of A ∪ B" and nothing else — a Theta sketch is a
  * SAMPLE of the key space (the k smallest hashes), so stored sketches
  * additionally support INTERSECTION and difference estimates
  * (Dasgupta et al., "Theta-Sketch Framework", and the Apache
  * DataSketches library shipped with Spark itself). That unlocks the
  * audience-overlap family: distinct users active in BOTH week w and
  * week w+1, from per-week sketches alone, no rescan and no pairwise
  * user join.
  *
  * Mergeability: the aggregation buffer is a theta Union; partial
  * unions combine through the shuffle exactly like any other partial
  * aggregate, and the union operation is commutative/associative on
  * the retained-hash sets. In exact mode (≤ 2^lgK distinct keys per
  * sketch) the retained set IS the full hash set, so every estimate —
  * including intersections — is exact and partition-invariant; in
  * estimation mode the k-smallest-hash trim keeps the result
  * order-insensitive for unions while accuracy follows the published
  * theta bounds. The registered consumer ([[graft.ops.Analytics]]
  * q28c) gates through the verdict-row idiom, so only exact counts and
  * a bound flag are ever emitted.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"theta_sketch expects an integral column, got $t")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buffer.update(l)
      case i: Int  => buffer.update(i.toLong)
      case other => // checkInputDataTypes admits only Long/Int today; a
        // future type widening must extend BOTH places, not MatchError here
        throw new IllegalStateException(
          s"theta_sketch: unsupported input value class ${other.getClass.getName} " +
            s"for declared type ${child.dataType}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)

  override def prettyName: String = "theta_sketch"
}

object ThetaSketchAgg {
  import org.apache.spark.sql.{Column, GraftBridge}

  /** Default nominal entries 2^12 — matches Spark's HLL default lgK. */
  val defaultLgK = 12

  /** DataFrame-API form: `df.agg(thetaSketch(col("user_id")))`. */
  def thetaSketch(c: Column, lgK: Int = defaultLgK): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(c), lgK).toAggregateExpression())

  /** Driver-side estimate of a stored compact sketch. */
  def estimate(bytes: Array[Byte]): Double =
    CompactSketch.wrap(Memory.wrap(bytes)).getEstimate

  /** True while the stored sketch is in EXACT mode (theta == 1: every
    * key hash retained, nothing sampled). Consumers that pin exactness
    * (q28c's in_bound=1 oracle) must check this and fail loudly when a
    * bigger corpus crosses into estimation mode, where intersection
    * error follows the union size, not the overlap. */
  def isExact(bytes: Array[Byte]): Boolean =
    !CompactSketch.wrap(Memory.wrap(bytes)).isEstimationMode

  /** Driver-side intersection estimate of two stored compact sketches. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte], lgK: Int = defaultLgK): Double = {
    val i: Intersection = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
    i.intersect(CompactSketch.wrap(Memory.wrap(a)))
    i.intersect(CompactSketch.wrap(Memory.wrap(b)))
    i.getResult.getEstimate
  }

  /** Intersection estimate WITH the library's own error interval:
    * (lower, estimate, upper) at `numStdDev` standard deviations. This
    * is the ESTIMATION-MODE consumer API — the bounds come from the
    * intersection result's effective theta and retained-entry count, so
    * they carry the union-size-dependent error a bare 3·rse-of-overlap
    * heuristic gets wrong (the r9 advisory). q28c's registered gate
    * asserts exact mode because its oracle pins in_bound=1 exactly; a
    * corpus past 2^lgK distinct keys per sketch answers overlap queries
    * through THIS method instead (ThetaSketchSpec property-tests the
    * interval's coverage in estimation mode). */
  def intersectBounds(a: Array[Byte], b: Array[Byte],
      numStdDev: Int = 2, lgK: Int = defaultLgK): (Double, Double, Double) = {
    val i: Intersection = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
    i.intersect(CompactSketch.wrap(Memory.wrap(a)))
    i.intersect(CompactSketch.wrap(Memory.wrap(b)))
    val r = i.getResult
    (r.getLowerBound(numStdDev), r.getEstimate, r.getUpperBound(numStdDev))
  }
}
