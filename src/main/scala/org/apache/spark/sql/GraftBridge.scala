package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column <-> Expression
  * converters, the established pattern for Spark extension libraries
  * that build custom Catalyst expressions (Column construction from an
  * Expression has no public API in Spark 4).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
