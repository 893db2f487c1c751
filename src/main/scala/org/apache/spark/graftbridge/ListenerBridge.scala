package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; diagnostics that
  * read listener-populated counters (graft.SpillProbe) need a
  * deterministic flush instead of a sleep. Same shim pattern as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
