package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's Column↔Expression conversion (moved behind
  * `private[sql]` in the classic module). Lets graft expose native Catalyst
  * expressions (e.g. RollingHash) as first-class Columns. */
object GraftExpressionBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
