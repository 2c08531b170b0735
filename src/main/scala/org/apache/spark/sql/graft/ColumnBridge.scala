package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column to a backend-agnostic ColumnNode wrapper; the
  * catalyst bridge (`ExpressionUtils.column` / `.expression`) is
  * `private[sql]`, so libraries contributing native Catalyst expressions
  * re-export it from inside the `org.apache.spark.sql` package — the
  * standard extension-library pattern (the classic-backend equivalent of
  * the old `new Column(expr)`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
