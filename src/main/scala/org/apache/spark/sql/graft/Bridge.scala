package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x wraps `Column` around `ColumnNode`; the sanctioned internal
  * converter (`ExpressionUtils`) is `private[sql]`, so this bridge lives in a
  * subpackage of `org.apache.spark.sql`. It is the only place the engine
  * touches non-public Spark API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Stable unique token for a session (`sessionUUID` is `private[sql]`):
    * survives GC-recycled identity hashes, distinct across sessions sharing
    * one SparkContext.
    */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID

  /** Block until the listener bus has delivered every queued event
    * (`listenerBus` is `private[spark]`): required before reading
    * accumulated task metrics off a custom SparkListener — task-end events
    * are delivered asynchronously, so metrics read right after an action
    * can miss its tail tasks.
    */
  def waitListenerBus(spark: SparkSession, timeoutMs: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Register a Catalyst expression builder as a SQL function on this session
    * (usable from `spark.sql`/`expr`). Idempotent.
    */
  def registerFunction(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
