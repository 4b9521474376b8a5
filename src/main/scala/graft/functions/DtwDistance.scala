package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native banded Dynamic Time Warping distance over two `array<long>`
  * series (Sakoe–Chiba band; |a_i − b_j| step cost, the classic
  * symmetric-step recurrence D(i,j) = cost + min(D(i−1,j), D(i,j−1),
  * D(i−1,j−1))).
  *
  * Why a custom Expression (the DotProduct rationale): the DP carries an
  * intra-row sequential dependency, which the higher-order-function
  * vocabulary cannot express without nesting interpreted lambdas per
  * cell; this expression runs the O(n·band) rolling-row loop as tight
  * primitive Java inside WholeStageCodegen.
  *
  * All-integer: costs and sums are exact int64 (series are bounded cents
  * sums; a warping path adds ≤ n+m terms, orders of magnitude inside
  * long range). Out-of-band cells carry the INF sentinel (2^60 — dead
  * paths may accumulate a few step costs on top without approaching
  * overflow, and a live path always exists inside the band when
  * |n − m| ≤ band, which checkInputDataTypes-adjacent eval enforces).
  * Deterministic: pure function of the two arrays. */
case class DtwDistance(left: Expression, right: Expression, band: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // containsNull=true is accepted at the TYPE level (a parquet or
    // checkpoint round-trip marks never-null arrays nullable), but a null
    // ELEMENT fails loudly at eval — getLong on a null slot would silently
    // read 0 and corrupt the distance (callers coalesce, e.g. x60's series).
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (band < 0)
      TypeCheckResult.TypeCheckFailure(s"dtw_arr band must be >= 0, got $band")
    else if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dtw_arr expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  private val INF = 1L << 60

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (math.abs(n - m) > band)
      throw new IllegalArgumentException(
        s"dtw_arr: no in-band warping path for lengths $n vs $m at band $band")
    var k = 0
    while (k < n) {
      if (x.isNullAt(k)) throw new IllegalArgumentException(
        s"dtw_arr: null element at index $k in left series")
      k += 1
    }
    k = 0
    while (k < m) {
      if (y.isNullAt(k)) throw new IllegalArgumentException(
        s"dtw_arr: null element at index $k in right series")
      k += 1
    }
    var prev = Array.fill(m + 1)(INF)
    var curr = Array.fill(m + 1)(INF)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(curr, INF)
      var j = math.max(1, i - band)
      val hi = math.min(m, i + band)
      while (j <= hi) {
        val c = math.abs(x.getLong(i - 1) - y.getLong(j - 1))
        var best = prev(j)
        if (curr(j - 1) < best) best = curr(j - 1)
        if (prev(j - 1) < best) best = prev(j - 1)
        curr(j) = c + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dtwN")
      val m = ctx.freshName("dtwM")
      val prev = ctx.freshName("dtwPrev")
      val curr = ctx.freshName("dtwCurr")
      val tmp = ctx.freshName("dtwTmp")
      val i = ctx.freshName("dtwI")
      val j = ctx.freshName("dtwJ")
      val hi = ctx.freshName("dtwHi")
      val c = ctx.freshName("dtwC")
      val best = ctx.freshName("dtwBest")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if (java.lang.Math.abs($n - $m) > $band) {
         |  throw new IllegalArgumentException("dtw_arr: no in-band warping path for lengths "
         |    + $n + " vs " + $m + " at band " + $band);
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) throw new IllegalArgumentException(
         |    "dtw_arr: null element at index " + $i + " in left series");
         |}
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($b.isNullAt($i)) throw new IllegalArgumentException(
         |    "dtw_arr: null element at index " + $i + " in right series");
         |}
         |long[] $prev = new long[$m + 1];
         |long[] $curr = new long[$m + 1];
         |java.util.Arrays.fill($prev, ${INF}L);
         |$prev[0] = 0L;
         |for (int $i = 1; $i <= $n; $i++) {
         |  java.util.Arrays.fill($curr, ${INF}L);
         |  int $hi = java.lang.Math.min($m, $i + $band);
         |  for (int $j = java.lang.Math.max(1, $i - $band); $j <= $hi; $j++) {
         |    long $c = java.lang.Math.abs($a.getLong($i - 1) - $b.getLong($j - 1));
         |    long $best = $prev[$j];
         |    if ($curr[$j - 1] < $best) $best = $curr[$j - 1];
         |    if ($prev[$j - 1] < $best) $best = $prev[$j - 1];
         |    $curr[$j] = $c + $best;
         |  }
         |  long[] $tmp = $prev; $prev = $curr; $curr = $tmp;
         |}
         |${ev.value} = $prev[$m];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DtwFunctions {
  /** Banded DTW distance over array<long> columns — codegen'd. */
  def dtwArr(a: Column, b: Column, band: Int): Column =
    GraftBridge.column(DtwDistance(
      GraftBridge.expression(a), GraftBridge.expression(b), band))
}
