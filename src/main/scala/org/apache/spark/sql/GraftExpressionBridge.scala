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

  /** Clone `s` into a sibling session sharing the SparkContext and all
    * session state (confs, temp views, UDFs) but with an ISOLATED
    * SQLConf — the supported way to run a query under a different
    * `spark.sql.shuffle.partitions` without mutating shared session
    * state (`cloneSession` is `private[sql]`, hence this bridge). Used
    * by the stream harness so a per-stream partition override can
    * never race a concurrent consumer of the original session. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()

  /** Rebind `df`'s logical plan to session `s` (re-analyzed there), so
    * a frame built on one session can execute under a clone's conf. */
  def withSession(s: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].logicalPlan)
}
