package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 marks `ExpressionUtils` (and the
  * Column(Expression) constructor) private[sql]; third-party native
  * expressions reach them through a shim package in the org.apache.spark.sql
  * namespace — the conventional extension-library pattern. Public Spark API
  * only; nothing here depends on internals beyond the accessor itself. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
