package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over `array<float>`/`array<double>`.
  *
  * Why a custom Expression (SURVEY.md §4, deferred-until-bench item): the
  * higher-order-function formulation (`aggregate(zip_with(a,b,*),0,+)`)
  * is evaluated interpreted — per-element lambda dispatch with boxing —
  * and benched 70 s on the 2M-pair near-dup self-join at sf0.1. This
  * expression generates a tight primitive loop inside WholeStageCodegen
  * (and a matching interpreted path), ~50× less per-pair cost.
  *
  * Semantics match the DuckDB oracle exactly: elements are widened
  * float→double (exact), products accumulated sequentially left-to-right
  * in double — the same IEEE result the oracle's `list_dot_product` over
  * double-cast lists produces.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_arr expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException( // fail fast — the oracle's list_dot_product errors too
        s"dot_arr: dimension mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xi * yi
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: two DotProducts in one codegen scope (e.g. dot + normSq
      // in a single projection) must not collide on local variable names
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotSum")
      val i = ctx.freshName("dotI")
      val xGet = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yGet = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException("dot_arr: dimension mismatch "
         |    + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += ($xGet) * ($yGet); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  /** dot(a, b) over array<float|double> columns — codegen'd. */
  def dotArr(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** squared L2 norm. */
  def normSqArr(a: Column): Column = dotArr(a, a)
}
