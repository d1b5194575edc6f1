package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Measurement-only shim (bench/profiling harness, never the library
  * surface): `SparkContext.listenerBus` is `private[spark]`, so draining
  * the async listener bus — required for EXACT per-rep task-metric deltas
  * in `graft.Bench`'s mechanism probe — needs one file inside the
  * `org.apache.spark` namespace. This is the standard idiom Spark's own
  * test utilities use (`SparkContext.listenerBus.waitUntilEmpty`); without
  * the drain, task-end events posted microseconds after an action returns
  * would attribute to the NEXT rep's counter window.
  */
object ListenerBusDrain {
  /** Block until all queued listener events are delivered (bounded by
    * `timeoutMs`); swallow timeouts — a late event skews one rep's counter
    * by one task, which the per-query median absorbs. */
  def drain(sc: SparkContext, timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
