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

  /** True when the Column is a plan-time constant: a literal node, or
    * an `array(...)` call over constants. Needed because Spark 4's
    * `ExpressionUtils.expression` wraps the ColumnNode in a LAZY
    * `ColumnNodeExpression` whose `foldable` is false until analysis —
    * construction-time foldability must be read off the node tree. */
  def isConstant(c: Column): Boolean = {
    def go(n: internal.ColumnNode): Boolean = n match {
      case _: internal.Literal => true
      case f: internal.UnresolvedFunction =>
        f.functionName == "array" && f.arguments.forall(go)
      case _ => false
    }
    go(c.node)
  }
}
