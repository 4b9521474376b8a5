package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native polynomial rolling-hash folds — the x11b hot path.
  *
  * Why custom Expressions (the WinnowFingerprints/TopTokenCount
  * precedent): x11b's per-window hashes were an interpreted
  * `transform(sequence(...), i -> aggregate(slice(vals, i, w), 0, step))`
  * — O(n·w) boxed lambda dispatches plus a slice allocation per window,
  * all CodegenFallback. These two expressions run the identical fold
  * `acc' = (acc·base + v) mod m` as tight JVM loops callable from
  * whole-stage codegen.
  *
  * Overflow contract: the fold stays exact while every element is in
  * [0, 2^32) — then `(mod-1)·base + v` fits a signed long (x11b: mod
  * 1e15, base 131 → max ≈ 1.31e17 ≪ 2^63). The construction-time
  * require bounds base/mod under that element envelope; the ELEMENTS
  * themselves are the caller's contract (x11b's are 32-bit md5 halves
  * by construction) — an out-of-range element wraps exactly like the
  * non-ANSI lambda fold it replaces, it is not detected here. Null
  * elements fold as 0 (they cannot occur from the md5 producer; the
  * lambda reference would instead propagate null through the fold —
  * a defined deviation, not claimed identical). */
case class RollingHashFold(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 0 && base > 0 && (mod - 1) <= (Long.MaxValue - (1L << 32)) / base,
    s"rolling hash (base=$base, mod=$mod) could overflow a signed long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash_fold expects array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.fold(input.asInstanceOf[ArrayData], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.fold($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `window`-wide rolling hashes of an array<bigint> (empty when the
  * array is shorter than the window) — see [[RollingHashFold]]. */
case class RollingHashWindows(child: Expression, window: Int, base: Long, mod: Long)
    extends UnaryExpression {

  require(window >= 1, s"rolling window must be >= 1, got $window")
  require(mod > 0 && base > 0 && (mod - 1) <= (Long.MaxValue - (1L << 32)) / base,
    s"rolling hash (base=$base, mod=$mod) could overflow a signed long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_hash_windows expects array<bigint>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RollingHash.windows(input.asInstanceOf[ArrayData], window, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHash.windows($c, $window, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** foldLeft(0)((acc, v) => (acc·base + v) mod m) over the whole array;
    * null elements (cannot occur from the md5 producer) fold as 0. */
  def fold(arr: ArrayData, base: Long, mod: Long): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      acc = (acc * base + v) % mod
      i += 1
    }
    acc
  }

  /** The same fold over every `window`-wide slice. O(n·window) with zero
    * allocations beyond the output — window is a small constant (x11b:
    * 8), so the true rolling-update form (modular leading-term removal)
    * buys nothing and would change no value. */
  def windows(arr: ArrayData, window: Int, base: Long, mod: Long): ArrayData = {
    val n = arr.numElements()
    if (n < window) return EMPTY
    val m = n - window + 1
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      i += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var acc = 0L
      var j = s
      while (j < s + window) {
        acc = (acc * base + vals(j)) % mod
        j += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }
}

object RollingHashFunctions {
  /** rolling_hash_fold(vals): polynomial fold of the whole array. */
  def rollingFold(vals: Column, base: Long, mod: Long): Column =
    GraftBridge.column(RollingHashFold(GraftBridge.expression(vals), base, mod))

  /** rolling_hash_windows(vals): fold of every `window`-wide slice. */
  def rollingWindows(vals: Column, window: Int, base: Long, mod: Long): Column =
    GraftBridge.column(RollingHashWindows(GraftBridge.expression(vals), window, base, mod))
}
