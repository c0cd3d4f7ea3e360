package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal `private[sql]` bridge: wrap a raw Catalyst [[Expression]] as a
  * public [[Column]] and back. Spark 4 moved `Column` onto `ColumnNode`s and
  * made the Expression constructors `private[sql]`; graft's custom codegen
  * expressions (e.g. `graft.functions.DotProduct`) need exactly these two
  * hooks and nothing else from the internal API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
