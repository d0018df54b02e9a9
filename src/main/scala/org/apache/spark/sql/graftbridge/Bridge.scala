package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's custom Catalyst
  * expressions can surface as Columns. Lives in an org.apache.spark.sql
  * subpackage purely for qualified-private access; contains no logic. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the async listener bus so listener-collected metrics are
    * complete before a test reads them (`listenerBus` is private[spark]). */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
                           timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
