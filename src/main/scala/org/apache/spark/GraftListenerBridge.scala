package org.apache.spark

/** `LiveListenerBus.waitUntilEmpty` is `private[spark]`; the bench needs
  * it to attribute shuffle metrics to the query that just ran (listener
  * events are delivered asynchronously, so reading counters right after
  * an action races the bus). Same narrow-bridge pattern as
  * [[org.apache.spark.sql.GraftSqlBridge]]. */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
