package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> catalyst Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 split
  * Column off the catalyst Expression tree (ColumnNode indirection for
  * Connect); a library that defines native expressions needs exactly these
  * two calls to expose them as Columns without routing through the mutable
  * session FunctionRegistry. Living under org.apache.spark.sql.* is the
  * standard extension-library access pattern for `private[sql]` API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
