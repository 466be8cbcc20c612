package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-query in/out event counters (reference: stream metrics,
  * pkg/pubsub/stream.go:144-195; drain-barrier test
  * stream_test.go:275-300). Spark's StreamingQueryProgress already
  * carries numInputRows/processedRowsPerSecond per source — this listener
  * folds them into the reference's counter shape.
  */
final class MetricsListener extends StreamingQueryListener {

  private val in = mutable.Map.empty[java.util.UUID, Long]
  private val batches = mutable.Map.empty[java.util.UUID, Long]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val id = e.progress.id
    in(id) = in.getOrElse(id, 0L) + e.progress.numInputRows
    batches(id) = batches.getOrElse(id, 0L) + 1
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def eventsIn(queryId: java.util.UUID): Long =
    synchronized(in.getOrElse(queryId, 0L))
  def batchCount(queryId: java.util.UUID): Long =
    synchronized(batches.getOrElse(queryId, 0L))
  def totalEventsIn: Long = synchronized(in.values.sum)
}

object Metrics {
  /** Install a metrics listener on the session and return it. */
  def install(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }
}
