package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row repetition statistics over a token array — the x32
  * (Gopher repetition filter) hot path.
  *
  * Why custom Expressions (the Md5Long/DotProduct precedent): the
  * higher-order-function formulation — an `aggregate` run-length fold
  * over `array_sort` for the top-token count, `transform`+`concat_ws`
  * +`array_distinct` for the duplicate-2-gram fraction — is
  * CodegenFallback: every lambda step interprets an expression tree per
  * array element with boxed state, and x32 benched as the #2 line on
  * the board despite being a zero-shuffle per-row map. These two
  * expressions do the same work as tight JVM loops callable from
  * whole-stage codegen.
  *
  * Determinism: both outputs are pure integer counts over the exact
  * token multiset — independent of hash seeds, sort stability, and
  * evaluation order — so the DuckDB oracle's list-lambda derivation
  * agrees exactly. Null array elements cannot occur in `split()` output
  * (the only producer); both expressions treat one defensively as an
  * empty string rather than failing.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"top_token_count expects array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TopTokenCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopTokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopTokenCount {
  /** Max multiplicity of any element: sort a reference copy (UTF8String
    * binary order — any total order works, only equal-adjacency is
    * used), then one run-length scan with constant state. O(n log n),
    * zero per-element expression dispatch. 0 for an empty array. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val a = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      a(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(a)
    var best = 1L
    var run = 1L
    i = 1
    while (i < n) {
      if (a(i) == a(i - 1) || a(i).equals(a(i - 1))) {
        run += 1
        if (run > best) best = run
      } else run = 1L
      i += 1
    }
    best
  }
}

/** Number of DISTINCT adjacent 2-grams of a token array (0 when fewer
  * than 2 tokens) — see the file header for why this is native. */
case class DistinctBigramCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"distinct_bigram_count expects array<string>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    DistinctBigramCount.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DistinctBigramCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctBigramCount {
  private val SPACE = UTF8String.fromString(" ")

  /** One pass, a HashSet of space-joined grams (tokens come from a
    * single-space split, so "a b" is injective on pairs — the same gram
    * string the lambda formulation and the oracle build). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val set = new java.util.HashSet[UTF8String](Math.max(4, n * 2))
    var prev = if (arr.isNullAt(0)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      set.add(UTF8String.concat(prev, SPACE, cur))
      prev = cur
      i += 1
    }
    set.size.toLong
  }
}

object TextFunctions {
  /** top_token_count(w): max multiplicity of any token — codegen'd. */
  def topTokenCount(w: Column): Column =
    GraftBridge.column(TopTokenCount(GraftBridge.expression(w)))

  /** distinct_bigram_count(w): distinct adjacent 2-grams — codegen'd. */
  def distinctBigramCount(w: Column): Column =
    GraftBridge.column(DistinctBigramCount(GraftBridge.expression(w)))
}
