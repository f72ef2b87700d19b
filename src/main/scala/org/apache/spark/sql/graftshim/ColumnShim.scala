package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Spark 4 made `Column` wrap a connect-compatible `ColumnNode` instead of a
 * Catalyst `Expression`; the classic bridge (`ExpressionUtils`) is
 * `private[sql]`. This shim re-exports the two conversions the engine needs to
 * expose native Catalyst expressions as user-facing Columns. Public Spark API
 * only — same technique Spark's own `functions` object uses internally.
 */
object ColumnShim {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
