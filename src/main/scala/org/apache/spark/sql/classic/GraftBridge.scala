package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge to the sql-private Column <-> Expression converters —
  * the standard pattern for libraries that ship custom Catalyst
  * expressions without a SparkSessionExtensions registration (graft uses
  * DotProductD from graft.functions.expressions).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
