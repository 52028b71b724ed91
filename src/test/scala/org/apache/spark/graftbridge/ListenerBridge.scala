package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only accessor for the private[spark] listener bus: lets specs
  * drain listener events deterministically instead of sleeping (a
  * fixed sleep flakes on a loaded CI box).
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
