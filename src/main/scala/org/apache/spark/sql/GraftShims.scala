package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for Column <-> Catalyst Expression, which Spark 4 made
  * private[sql] (classic.ExpressionUtils). Needed to expose custom
  * codegen'd expressions (graft.functions.RollingHash) as user-facing
  * Columns.
  */
object GraftColumnShim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
