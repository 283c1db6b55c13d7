package org.apache.spark

/** Test-only bridge to `private[spark]` listener-bus draining:
  * listener delivery is asynchronous, so a spec asserting "building
  * this DataFrame launched no job" must flush the bus before reading
  * its counter. */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
