package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved `Column` to a ColumnNode representation; wrapping a raw
  * Catalyst `Expression` (needed for graft's native codegen expressions in
  * graft.functions) goes through `ExpressionUtils`, which is `private[sql]`
  * — hence this one-file shim living under the `org.apache.spark.sql`
  * package. Only public-Spark internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
