package org.apache.spark.sql
package graftshim

import org.apache.spark.SparkContext

/** Listener-bus drain for measurement attribution. `SparkContext.listenerBus`
  * is `private[spark]`; the bench attributes per-task I/O metrics to the
  * metric being timed, which requires the async bus to drain before the
  * attribution label changes. The alternative — a fixed `Thread.sleep` after
  * every measured body — costs ~1 s per metric and still races a slow bus.
  * Same convention as [[ColumnBridge]]: no Spark internals are modified.
  */
object ListenerBusBridge {

  /** Block until every queued listener event is dispatched (bounded by
    * `timeoutMillis`; a timeout is swallowed — attribution then loses the
    * still-queued tail, which is the same failure mode the sleep had). */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
