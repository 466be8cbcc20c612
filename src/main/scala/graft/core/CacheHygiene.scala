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

  /** Cache AND materialize `df` now, so every join planned over it (or
    * over a frame derived from it) sees the cache's TRUE size instead
    * of a scan-derived guess.
    *
    * Why this exists: Catalyst's size-only estimator propagates a file
    * scan's on-disk bytes through `Generate` unchanged (explode has no
    * fan-out multiplier) and scales `Project` by schema defaultSize
    * ratios (every string counts 20 bytes regardless of content). For
    * the candidate-generation shape `docs -> shingles -> explode ->
    * (doc_id, hash64)` that chain walks a multi-hundred-MB corpus scan
    * DOWN below `spark.sql.autoBroadcastJoinThreshold`, so the planner
    * broadcasts a corpus-sized self-join side. Measured on the mult=300
    * scale fixture: the exploded shingle frame (~10^8 rows) was planned
    * BuildRight and aborted at the 8 GiB broadcast hard limit — and at
    * mult=100 the same plan silently built a ~2.5 GiB broadcast.
    * Materializing the pinned frame first gives the planner the
    * InMemoryRelation's measured bytes: small corpora keep their
    * broadcast plans, big ones fall back to sort-merge — the stats fix,
    * not a hint that would pin one strategy at every scale. This also
    * mirrors the production deployment, where this stage is a parquet
    * write whose files carry true sizes.
    *
    * The count is an extra scheduling round-trip, not extra work — the
    * first action would have filled the cache anyway — and it runs
    * inside Bench's timed region, so the cost is measured, not hidden.
    */
  def pinMaterialized(df: DataFrame): DataFrame = {
    val pinned = df.cache()
    pinned.count()
    pinned
  }

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
