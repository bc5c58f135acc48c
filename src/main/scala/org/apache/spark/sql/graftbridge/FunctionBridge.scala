package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge to the `private[sql]` session function registry — lets the
  * library register its native expressions as SQL functions on an ALREADY
  * RUNNING session (the extensions config path only applies to sessions
  * built with `spark.sql.extensions`). Same placement rationale as
  * [[ColumnBridge]]: subpackage of org.apache.spark.sql solely for
  * access; no Spark internals of its own. */
object FunctionBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}
