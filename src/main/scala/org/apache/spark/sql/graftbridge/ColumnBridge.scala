package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` / `.expr` surface;
  * the classic-mode converters live in `private[sql] ExpressionUtils`.
  * This bridge sits in an `org.apache.spark.sql` subpackage to re-expose
  * exactly those two conversions to the graft library — the standard
  * pattern for Catalyst-extension libraries on Spark 4.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
