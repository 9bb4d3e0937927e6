package org.apache.spark

/** Minimal bridge into `private[spark]` API (see SURVEY.md §7.4 item 1):
  * draining the async listener bus so metrics snapshots are complete. */
object GraftSparkBridge {
  def waitListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
