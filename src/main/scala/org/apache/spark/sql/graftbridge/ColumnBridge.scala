package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters — the one
  * hook needed to expose custom Catalyst expressions as Columns in
  * Spark 4 (where `new Column(expr)` no longer exists). Lives in a
  * subpackage of org.apache.spark.sql solely for access; contains no
  * Spark internals of its own. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
