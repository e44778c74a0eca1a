package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, but
  * deterministic listener-based plan assertions (PipelineSpec's
  * one-corpus-scan guard) need to drain the asynchronous event bus
  * before asserting. Lives under `org.apache.spark` for access only —
  * never shipped as library API (test sources).
  */
object TestListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
