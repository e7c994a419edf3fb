package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split `Column` from Catalyst `Expression` (Connect-compatible
  * ColumnNode API); the conversions live behind `private[sql]`. This bridge
  * re-exposes just the two conversions our custom Catalyst expressions need.
  * Compiled into our jar; no Spark source is modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
