package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge: `ExpressionUtils` is `private[sql]` in
  * Spark 4's decoupled Column API, so the two conversions custom
  * expressions need are re-exported from inside the package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
