package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` in Spark 4, so custom-Expression libraries need this
  * one-file shim inside the package (the usual extension pattern).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
