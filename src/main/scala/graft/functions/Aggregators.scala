package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import graft.core.{EventEnvelope, Stamp}

/** Typed user-defined aggregates — the `Aggregator[IN, BUF, OUT]` form of
  * the reference's arbitrary pipeline operators (`NewPipelineOperator`,
  * reference: pkg/processing/operator_repository.go:35-61): a custom
  * window function whose output is a derived event stamped with the
  * merged interval of its inputs (NewEventFromOthers,
  * pkg/events/timestamper.go:22-50).
  *
  * Aggregators run inside Spark's hash aggregation with partial
  * aggregation and arbitrary merge order — which is why the buffer is a
  * commutative summary (min/max/sum), not an event list.
  */
object Aggregators {

  /** (minStartMillis, maxEndMillis, sum). */
  type SumBuf = (Long, Long, Double)

  /** Sum of contents with stamp lineage: the Aggregator equivalent of
    * the reference's BatchSum (default_operators.go:18-38).
    */
  class EnvelopeSum extends Aggregator[EventEnvelope[Double], SumBuf,
      EventEnvelope[Double]] {

    override def zero: SumBuf = (Long.MaxValue, Long.MinValue, 0.0)

    override def reduce(b: SumBuf, e: EventEnvelope[Double]): SumBuf = (
      math.min(b._1, e.stamp.start_time.getTime),
      math.max(b._2, e.stamp.end_time.getTime),
      b._3 + e.content)

    override def merge(a: SumBuf, b: SumBuf): SumBuf = (
      math.min(a._1, b._1), math.max(a._2, b._2), a._3 + b._3)

    override def finish(b: SumBuf): EventEnvelope[Double] =
      EventEnvelope(
        Stamp(new Timestamp(b._1), new Timestamp(b._2), Map.empty),
        b._3)

    override def bufferEncoder: Encoder[SumBuf] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble)

    override def outputEncoder: Encoder[EventEnvelope[Double]] =
      ExpressionEncoder[EventEnvelope[Double]]()
  }

  def envelopeSum: EnvelopeSum = new EnvelopeSum
}
