package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column ↔ Expression converters of Spark 4's
  * classic API (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose custom Catalyst expressions (graft.functions.DotProduct) as
  * user-facing Columns. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
