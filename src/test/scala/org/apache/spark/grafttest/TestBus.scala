package org.apache.spark.grafttest

import org.apache.spark.SparkContext

/** Test-only access to the `private[spark]` listener bus so specs can
  * flush async listener deliveries before asserting on counters.
  */
object TestBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
