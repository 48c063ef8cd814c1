package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 removed the public `Column.expr` accessor (Column is now backed
 * by a ColumnNode shared with Connect). This bridge exposes the classic
 * converter — the supported way for Catalyst-extending libraries to move
 * between `Column` and `Expression`.
 */
object GraftSqlBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
