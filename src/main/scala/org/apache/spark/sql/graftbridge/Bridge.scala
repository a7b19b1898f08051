package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column <-> Catalyst Expression bridge. Spark 4 made the
  * public Column API implementation-agnostic (Connect refactor) and hid the
  * Expression accessors behind private[sql]; extension libraries reach them
  * from inside the sql package — the same seam spark-internal connectors
  * use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered every queued event
    * (or timeout). The job-count specs need this: a fixed sleep can
    * undercount jobs on a slow bus, turning the assertion into a false
    * pass.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
