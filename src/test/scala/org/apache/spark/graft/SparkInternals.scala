package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` internals: the LSH degenerate-
  * bucket regression spec measures bytes returned to the driver via a
  * SparkListener, and must drain the listener bus before reading its
  * counter — otherwise the assertion races event delivery.
  */
object SparkInternals {
  def waitListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
