package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversions.
  * Spark 4 decoupled Column from Catalyst (Column wraps a ColumnNode);
  * wiring a custom Expression into the classic runtime goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package
  * private — this shim is the single sanctioned crossing point.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
