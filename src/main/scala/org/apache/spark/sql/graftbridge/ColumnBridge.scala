package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters (the
  * Spark 4 Column is backed by ColumnNode, not Expression; these are the
  * blessed internal converters). Living under `org.apache.spark.sql` grants
  * the package-private access — the standard technique for extension
  * libraries that ship custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
