package org.apache.spark

/** Test-only bridge into `private[spark]` members — the same trick
  * Spark's own TestUtils uses. Lets specs drain the async listener
  * bus deterministically instead of sleeping a fixed settle window
  * (a delayed event on a slow box would flake a fixed sleep in
  * either direction).
  */
object GraftSparkTestAccess {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
