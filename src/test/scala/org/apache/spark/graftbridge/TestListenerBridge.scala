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

  /** `SparkContext.setCheckpointDir` has no public unset; tests that
    * exercise the reliable-checkpoint branch must restore the shared
    * context afterwards or every later suite silently loses coverage
    * of the localCheckpoint branch. `checkpointDir` is
    * `private[spark] var` — reachable from this package. */
  def clearCheckpointDir(sc: SparkContext): Unit =
    sc.checkpointDir = None
}
