package graft.core

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Release pinned intermediates (cache / localCheckpoint blocks) once the
  * frame derived from them first materializes.
  *
  * The library's candidate-generation operators pin a reused projection
  * (the LSH banded frames) so the self-join's two sides share one
  * computation. The pin must outlive the RETURNED lazy plan's first
  * action — so the operator itself cannot unpersist before returning, and
  * leaving it pinned leaks executor storage across a long-lived session
  * (Bench only masked this with clearCache()). This listener watches for
  * the first successful action whose analyzed plan contains the derived
  * frame's plan, then unpersists the intermediate and unregisters itself.
  *
  * If the caller materializes the result more than once, later actions
  * recompute the projection — the documented trade: bounded storage over
  * repeat-action speed. At cluster scale the projection is a parquet
  * write instead and none of this applies.
  */
object CacheHygiene {

  def unpersistAfterFirstUse(intermediate: DataFrame, result: DataFrame)
      : DataFrame =
    releaseAfterFirstUse(result)(() => intermediate.unpersist())

  /** The general form: run `release` once after `result`'s first
    * successful action. `unpersistAfterFirstUse` is the cache special
    * case; semDedup uses this to free its per-round localCheckpoint
    * blocks (which a plain unpersist() cannot reach — see
    * Components.freeCheckpoint) once pair mining has materialized.
    */
  def releaseAfterFirstUse(result: DataFrame)(release: () => Unit)
      : DataFrame = {
    val session = result.sparkSession
    val target = result.queryExecution.analyzed
    val done = new AtomicBoolean(false)
    lazy val listener: QueryExecutionListener = new QueryExecutionListener {
      private def touched(qe: QueryExecution): Boolean =
        qe.analyzed.exists(_.sameResult(target))
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        if (touched(qe) && done.compareAndSet(false, true)) {
          release()
          session.listenerManager.unregister(listener)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    session.listenerManager.register(listener)
    result
  }
}
