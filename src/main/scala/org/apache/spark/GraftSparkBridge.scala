package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals (same pattern
  * as org.apache.spark.sql.GraftColumnBridge on the SQL side). */
object GraftSparkBridge {

  /** Drain the async listener bus so a metrics listener has observed
    * every already-completed stage before a snapshot is read (the bus
    * posts events asynchronously; without the drain a bench's final
    * spill numbers can miss the last stages). Best-effort: a timeout
    * just means the snapshot is a floor, never an error. */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
