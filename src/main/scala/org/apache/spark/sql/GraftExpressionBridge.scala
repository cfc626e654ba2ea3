package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters —
  * the standard packaging pattern for Spark-native extension libraries
  * that ship custom Catalyst expressions without forking Spark (the
  * sanctioned alternative, SparkSessionExtensions#injectFunction, only
  * works when the extension owns session construction; this library
  * receives an already-built session from the driver). */
object GraftExpressionBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
