package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 hides `Column.expr` behind the Connect-compatible ColumnNode
  * layer; the classic-session converters live in `private[sql]`
  * ExpressionUtils. This thin forwarder, compiled into the sql package,
  * is the supported-extension idiom for exposing them to library code.
  */
object GraftColumnBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
