package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression conversions so graft
  * can expose its native Catalyst expressions as plain `Column`
  * functions (same pattern as public Spark extension libraries that
  * place a small factory inside the org.apache.spark.sql namespace).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
