package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Drain the async listener bus (measurement tools only): the public
  * API has no flush, and a fixed sleep either wastes time or loses
  * late onJobEnd events on a loaded bus (ADVICE r14, JobProbe).
  * Lives under `org.apache.spark` because `listenerBus` is
  * `private[spark]`; no reflection. */
object ListenerDrain {
  def apply(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
