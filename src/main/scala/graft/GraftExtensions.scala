package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DistinctBigramCount, DotProduct, Md5Long, TopTokenCount, WinnowFingerprints}

/** SparkSessionExtensions hook exposing graft's custom Catalyst
  * expressions to SQL users:
  *
  *   spark = SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions") ...
  *   spark.sql("SELECT dot_arr(a.embedding, b.embedding) ...")
  *
  * For sessions created without the config, [[GraftExtensions.register]]
  * installs the same functions imperatively. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // Whole-operator extension (brief tier c): the native as-of join's
    // planner strategy, plus its filter-pushdown rule. The rule joins the
    // operator-optimization batch, so left-only predicates written ABOVE
    // an as-of join keep sinking through it to the parquet scan.
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsofJoin)
  }
}

object GraftExtensions {
  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_arr",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_arr"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"dot_arr requires exactly 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }),
    ("md5_long64",
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long64"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"md5_long64 requires exactly 2 arguments (string, half), got ${args.length}")
        val half = args(1) match {
          case lit if lit.foldable => lit.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"md5_long64 half must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "md5_long64 half must be a literal (0 or 1)")
        }
        Md5Long(args(0), half)
      }),
    ("top_token_count",
      new ExpressionInfo(classOf[TopTokenCount].getName, "top_token_count"),
      (args: Seq[Expression]) => {
        if (args.length != 1)
          throw new IllegalArgumentException(
            s"top_token_count requires exactly 1 argument, got ${args.length}")
        TopTokenCount(args(0))
      }),
    ("distinct_bigram_count",
      new ExpressionInfo(classOf[DistinctBigramCount].getName, "distinct_bigram_count"),
      (args: Seq[Expression]) => {
        if (args.length != 1)
          throw new IllegalArgumentException(
            s"distinct_bigram_count requires exactly 1 argument, got ${args.length}")
        DistinctBigramCount(args(0))
      }),
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        if (args.length != 3)
          throw new IllegalArgumentException(
            s"winnow_fingerprints requires exactly 3 arguments (arr, shingle, window), got ${args.length}")
        def intLit(e: Expression, name: String): Int = e match {
          case lit if lit.foldable => lit.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"winnow_fingerprints $name must be an integer literal, got $other")
          }
          case _ => throw new IllegalArgumentException(
            s"winnow_fingerprints $name must be a literal")
        }
        WinnowFingerprints(args(0), intLit(args(1), "shingle"), intLit(args(2), "window"))
      }))

  /** Imperative registration for an existing session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    graft.plans.AsofJoin.install(spark)
  }
}
