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

  /** Unload every loaded state-store provider on this executor (local
    * mode: the whole JVM). A TERMINATED streaming query's providers stay
    * loaded — each holding its full state map on heap — until the
    * maintenance thread notices the deactivation, by default on a 60 s
    * interval; a session that runs many short streaming queries
    * back-to-back (the bench's 17 gates × repeats) accumulates dozens of
    * dead provider maps and pays their GC/maintenance drag in later
    * gates' micro-batch latencies. Calling this after a query stops
    * releases them deterministically; an active query that is
    * subsequently resumed from its checkpoint simply reloads — the same
    * recovery path a real restart takes.
    */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
