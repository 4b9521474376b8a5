package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, NamedExpression, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join: for every left row, attach the latest right row with
  * the same key and right.time <= left.time (ties among right rows at one
  * timestamp: the greatest payload wins — same contract as the composed
  * union+window form in `graft.ops.Windows.asofJoin`).
  *
  * This is the build brief's tier-(c) extension point: an operator Spark's
  * built-ins can't express as a single relational node, implemented as a
  * custom LogicalPlan + SparkStrategy + physical SparkPlan and registered
  * through SparkSessionExtensions (graft.GraftExtensions). The physical
  * plan is a partition-local merge: EnsureRequirements clusters both sides
  * on the key (one shuffle each, exactly like a shuffled join) and sorts
  * them by (key, time); the merge then advances a single right-side cursor
  * per partition — O(|L| + |R|), no row expansion, no window buffering.
  * That is the plan a 100 TB as-of needs: compared with the composed
  * union+window form it avoids unioning both inputs into one sort and
  * carrying null-padded left columns through the window, and it keeps the
  * left side's columns out of the right side's shuffle entirely.
  *
  * Null semantics (pinned by AsofPlanSpec): a null key or null time on
  * either side never matches — left rows still come out, with null asof
  * columns. This matches SQL join-key semantics (NULL = NULL is unknown).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightValues: Seq[NamedExpression],
    asofOutput: Seq[Attribute]) extends BinaryNode {

  // Mismatched key/time types would pass analysis (the node resolves
  // trivially, no coercion rule knows it) and then silently lose matches:
  // each side hash-partitions on its own type (murmur3(int 5) != murmur3
  // (long 5)) and the merge orderings are generated from the LEFT types.
  // Fail construction instead.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType} (add an explicit cast)")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType} (add an explicit cast)")
  // Unmatched left rows emit null asof columns, so a non-nullable asof
  // attribute would let NullPropagation fold coalesce/isnull downstream
  // into wrong results. Types must mirror the payload expressions.
  require(asofOutput.length == rightValues.length &&
    asofOutput.zip(rightValues).forall { case (a, v) => a.nullable && a.dataType == v.dataType },
    "asofOutput must be nullable attributes mirroring rightValues' types")

  override def output: Seq[Attribute] = left.output ++ asofOutput

  /** The asof columns are minted by this node, not read from a child. */
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node 1:1 onto [[AsofJoinExec]].
  * Injected via `SparkSessionExtensions.injectPlannerStrategy`
  * (graft.GraftExtensions) or imperatively through
  * `spark.experimental.extraStrategies` ([[AsofJoin.install]]). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, rv, out) =>
      AsofJoinExec(lk, lt, rk, rt, rv, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: push deterministic left-only predicates through the
  * as-of join into the left side. Catalyst's PushDownPredicates cannot see
  * through a node it doesn't know, so without this rule a
  * `asof.filter(left_col = x)` keeps the filter ABOVE the join and the
  * parquet scan underneath reads everything. Safe because the join emits
  * exactly one row per left row: filtering left rows before or after the
  * join is the same set. Runs inside the operator-optimization batch
  * (fixpoint), so a pushed filter keeps sinking through the left subtree
  * and reaches the scan's PushedFilters like any native join would allow. */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        // Predicates over ONLY the join key also constrain the right side:
        // a right row with key v can only ever match left rows with key v,
        // so if the predicate rejects v those matches are dropped anyway.
        // Built-in equi-joins get this via InferFiltersFromConstraints,
        // which can't see through an unknown node — without the mirror the
        // right table is fully scanned and shuffled for a one-key probe.
        //
        // Soundness requires the LEFT key to be a bare attribute: the
        // predicate then IS a function of the key value, and every right
        // row that can match a surviving left row satisfies the predicate
        // applied to the right key EXPRESSION (cast, computed — anything
        // deterministic of the same type, which the node requires). When
        // the left key is itself computed (e.g. cast(lcol)), a predicate
        // on lcol is NOT a function of the key value — a lossy cast can
        // collide rejected and kept lcol values — so no mirror fires
        // (limitation pinned in AsofPlanSpec).
        val mirrored = aj.leftKey match {
          case lk: Attribute if aj.rightKey.deterministic =>
            push.filter(_.references == AttributeSet(lk))
              .map(_.transform { case a: Attribute if a.exprId == lk.exprId => aj.rightKey })
          case _ => Nil
        }
        val newRight = mirrored.reduceOption(And)
          .map(Filter(_, aj.right)).getOrElse(aj.right)
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left), right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical as-of join: co-clustered, co-sorted, partition-local merge.
  *
  * Required child layout (EnsureRequirements inserts the exchanges/sorts):
  *   left:  clustered by key, sorted by (key asc, time asc)
  *   right: clustered by key, sorted by (key asc, time asc, payload asc)
  * The payload tail of the right ordering totalizes ties at one (key, time)
  * so "last right row wins" is deterministic run-to-run and equal to the
  * composed form's `last(struct) over (order by ... struct asc)`.
  *
  * The merge holds ONE buffered right row (the projected key/time/payload,
  * copied — parent iterators reuse row objects) and never rewinds: left
  * rows arrive in (key, time) order, so the latest-qualifying right row for
  * each left row is reachable by a forward-only cursor.
  *
  * Codegen note (measured, not assumed): the merge itself is interpreted —
  * per-left-row it runs two `UnsafeProjection`s and the comparators, where
  * the built-in SortMergeJoinExec it displaces would do produce-side
  * whole-stage codegen. The committed `graft.BenchScaling` audit (README
  * "Scaling audit", 64×/128× legs) puts numbers on that trade at sf0.1
  * replicated up to 128× (~12.8M events): the native operator beats the
  * fully-codegen'd composed union+window twin at EVERY factor in every
  * session — by a steady 5–10% on a quiet session (both forms step
  * linearly), and by up to ~7× when the session carries memory pressure
  * from preceding fact shuffles, where the composed form's union sort
  * degrades while this merge (one buffered right row, no union, no
  * window buffer) holds its time. The per-row interpreted-projection
  * overhead is inside the 5–10% steady-state margin the operator already
  * WINS by, so the codegen question is CLOSED (round 9, SURVEY §8): a
  * `CodegenSupport` merge is not planned — re-open only on a measured
  * regression at a scale the 128× legs didn't reach. */
case class AsofJoinExec(
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightValues: Seq[NamedExpression],
    asofOutput: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  /** Same as the logical node: asof columns are minted here. Without this,
    * TreeNode sees output attrs absent from the children and prints the
    * plan with the missing-input `!` marker. */
  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** Same observability surface as the built-in join execs: output rows
    * (== left rows, a cheap invariant check in the UI) and how many of
    * them actually found a right row (match rate is the first thing to
    * look at when an as-of result looks thin). */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightValues.map(v => SortOrder(v, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lKeyExpr = leftKey
    val lTimeExpr = leftTime
    val rKeyExpr = rightKey
    val rTimeExpr = rightTime
    val rValueExprs = rightValues
    val asofAttrs = asofOutput
    val nPayload = rValueExprs.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Both sides project to a common (key, time[, payload…]) prefix so
      // one pair of orderings (bound over k/t attrs, positions 0 and 1)
      // compares rows from either side.
      val kAttr = AttributeReference("k", keyType, nullable = true)()
      val tAttr = AttributeReference("t", timeType, nullable = true)()
      val keyOrd = RowOrdering.create(
        Seq(SortOrder(kAttr, Ascending)), Seq(kAttr, tAttr))
      val timeOrd = RowOrdering.create(
        Seq(SortOrder(tAttr, Ascending)), Seq(kAttr, tAttr))

      val lProj = UnsafeProjection.create(Seq(lKeyExpr, lTimeExpr), leftOut)
      val rProj = UnsafeProjection.create(
        (rKeyExpr +: rTimeExpr +: rValueExprs.map(_.asInstanceOf[Expression])), rightOut)

      // Output = left columns ++ payload columns of the buffered right row.
      // JoinedRow(leftRaw, combined) has schema leftOut ++ (k, t, payload…);
      // the result projection picks leftOut and the payload tail.
      val joinedSchema = leftOut ++ (kAttr +: tAttr +: asofAttrs)
      val resultProj = UnsafeProjection.create(leftOut ++ asofAttrs, joinedSchema)
      val joined = new JoinedRow
      val noMatch = new GenericInternalRow(2 + nPayload) // all-null combined row

      var curR: UnsafeRow = null // buffered right (key, time, payload…), private copy
      def advanceRight(): Unit =
        curR = if (rIter.hasNext) rProj(rIter.next()).copy() else null
      advanceRight()

      var lastMatch: UnsafeRow = null // latest qualifying right row for lastMatch's key

      lIter.map { lRaw =>
        val lkt = lProj(lRaw)
        // A buffered match from a previous (smaller) key can't serve this row.
        if (lastMatch != null && keyOrd.compare(lastMatch, lkt) != 0) lastMatch = null
        numOutputRows += 1
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          // null key/time never matches; left row still flows through
          resultProj(joined(lRaw, noMatch))
        } else {
          // Skip right rows that can never match any remaining left row:
          // null key, null time, or key strictly before the current left key.
          while (curR != null &&
              (curR.isNullAt(0) || curR.isNullAt(1) || keyOrd.compare(curR, lkt) < 0)) {
            advanceRight()
          }
          // Consume right rows at this key with time <= left time; the last
          // one consumed (greatest time, then greatest payload) is the match.
          while (curR != null && !curR.isNullAt(0) && !curR.isNullAt(1) &&
              keyOrd.compare(curR, lkt) == 0 && timeOrd.compare(curR, lkt) <= 0) {
            lastMatch = curR
            advanceRight()
          }
          if (lastMatch != null) numMatched += 1
          resultProj(joined(lRaw, if (lastMatch != null) lastMatch else noMatch))
        }
      }
    }
  }
}

object AsofJoin {
  /** Imperative hook for sessions built without
    * `spark.sql.extensions=graft.GraftExtensions`: adds the planner
    * strategy (idempotent) and the pushdown rule via experimental methods.
    * Note `extraOptimizations` runs after the main optimizer batches, so
    * the config-based injection is the one that lets pushed filters keep
    * sinking to the scan; this fallback still removes the post-join
    * filter. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsofJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsofJoin
  }
}
