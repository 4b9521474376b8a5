package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column ↔ Expression converters of Spark 4's
  * classic API (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose custom Catalyst expressions (graft.functions.DotProduct) as
  * user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan (graft.plans.AsofJoinPlan) as a DataFrame —
    * the private[sql] `Dataset.ofRows` constructor custom operators need. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (for building custom plans on top). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
