package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection — the x26 (MOSS-style overlap
  * mining) hot path, end to end in one per-row pass.
  *
  * Why a custom Expression (the TopTokenCount/Md5Long precedent): the
  * HOF formulation builds `m` shingle hex strings with an interpreted
  * `transform(sequence(...), i -> md5(array_join(slice(w, i, k), " ")))`,
  * then selects window minima with nested `slice`/`array_min`/
  * `array_position` lambdas — O(m·window) interpreted expression
  * dispatches and array allocations per document, all CodegenFallback.
  * This expression does the identical selection as a tight JVM loop:
  * one ThreadLocal MD5 digest streamed over the token bytes (no joined
  * string, no slice copies), leftmost-minimum per window, first-
  * encounter-order dedup.
  *
  * Output values are IDENTICAL to the lambda form — lowercase 32-char
  * md5 hex of the space-joined `shingle`-gram, winnowed with the same
  * leftmost-min rule — so the DuckDB oracle and every downstream df-cap
  * stage are untouched (the oracle hash gate proves the equivalence on
  * the real corpus; GraftExtensionsSpec pins it on random streams too).
  * Hex compare note: md5 hex is pure ASCII, so UTF8String binary order
  * (what `array_min` used) equals java.lang.String order — the
  * selection is engine-identical.
  */
case class WinnowFingerprints(child: Expression, shingle: Int, window: Int)
    extends UnaryExpression {

  require(shingle >= 1 && window >= 1,
    s"winnow_fingerprints needs shingle/window >= 1, got $shingle/$window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], shingle, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.compute($c, $shingle, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Called from both the interpreted path and generated code. */
  def compute(arr: ArrayData, shingle: Int, window: Int): ArrayData = {
    val n = arr.numElements()
    if (n < shingle) return Md5Hex.EMPTY_ARRAY
    val m = n - shingle + 1
    if (m < window) return Md5Hex.EMPTY_ARRAY
    // token byte views once (null elements stay null and are skipped in
    // the join below, exactly like array_join skips them)
    val toks = Md5Hex.tokenBytes(arr)
    // shingle hex strings: md5 streamed over token bytes + single spaces
    // (byte-identical input to md5(array_join(slice(w, i, k), " ")),
    // including array_join's null-skipping)
    val sh = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val md = Md5Hex.digest()
      var first = true
      var j = 0
      while (j < shingle) {
        val t = toks(i + j)
        if (t != null) {
          if (!first) md.update(Md5Hex.SPACE_BYTE)
          md.update(t)
          first = false
        }
        j += 1
      }
      sh(i) = Md5Hex.toHex(md.digest())
      i += 1
    }
    // leftmost minimum of each window, deduped in first-encounter order
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s <= m - window) {
      var best = s
      var j = s + 1
      while (j < s + window) {
        if (sh(j).compareTo(sh(best)) < 0) best = j
        j += 1
      }
      seen.add(sh(best))
      s += 1
    }
    Md5Hex.toArrayData(seen)
  }
}

object WinnowFunctions {
  /** winnow_fingerprints(w, shingle, window): winnowed md5-hex shingle
    * fingerprints of a token array — codegen'd. */
  def winnowFingerprints(w: Column, shingle: Int, window: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(w), shingle, window))
}
