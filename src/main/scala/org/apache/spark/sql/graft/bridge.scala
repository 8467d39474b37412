package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for the engine's native
  * expressions. Lives under `org.apache.spark.sql` because the classic
  * converters are `private[sql]` — the standard pattern for libraries that
  * ship custom Catalyst expressions without forcing every caller through
  * the SQL function registry.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
