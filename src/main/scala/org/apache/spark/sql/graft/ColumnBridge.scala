package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 moved these conversions to
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`;
  * this object lives in an `org.apache.spark.sql` subpackage solely to
  * re-expose the two conversions to graft's custom expressions. No other
  * internals are touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
