package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ catalyst-Expression converters —
  * the standard extension-point shim for libraries that ship native
  * Catalyst expressions (Spark 4 moved `Column` to a connect-agnostic API;
  * the classic converters live behind `private[sql]`). This is the only
  * file in the repo that reaches into the spark package namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
