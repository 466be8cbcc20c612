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

  /** Count-Min Sketch over strings: fixed (depth x width) counter grid,
    * mergeable by elementwise addition — the classic distributed
    * heavy-hitter sketch. The depth row hashes are the md5-sliced
    * Kirsch–Mitzenmacher double-hash family (expressions.Md5DoubleHash,
    * shared with the MinHash signature): one md5 per key plus depth
    * add-and-wrap steps — cheaper than the former per-row seeded FNV
    * (which rescanned the key once per row) and, the point,
    * reproducible digit-for-digit in the DuckDB oracle, so
    * q_heavy_hitters is hash-compared end to end. Estimate = min over
    * rows (always an OVERcount; error <= 2N/width with prob
    * 1 - 2^-depth).
    *
    * Buffer is a flat Array[Long] (depth*width) — constant size
    * regardless of input cardinality, which is the point: the shuffle
    * carries the grid, not the keys.
    */
  class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0)

    import graft.expressions.MinHashSignature.P

    @transient private lazy val md =
      java.security.MessageDigest.getInstance("MD5")

    /** All depth counter indices of key s in one digest pass — public so
      * estimation can run as a distributed join against the exploded
      * grid rather than a driver-side probe
      * (PipelineQueries.q_heavy_hitters).
      */
    def buckets(s: String): Array[Int] = {
      md.reset()
      val (a, b) = graft.expressions.Md5DoubleHash.params(
        md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val out = new Array[Int](depth)
      var h = a
      var r = 0
      while (r < depth) {
        out(r) = (h % width).toInt
        h += b
        if (h >= P) h -= P
        r += 1
      }
      out
    }

    /** Row r's counter index for key s (single-row convenience). */
    def bucket(row: Int, s: String): Int = buckets(s)(row)

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], s: String): Array[Long] = {
      val bs = buckets(s)
      var r = 0
      while (r < depth) { b(r * width + bs(r)) += 1; r += 1 }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()

    /** Point-estimate a key's count from a finished sketch. */
    def estimate(sketch: Array[Long], s: String): Long = {
      val bs = buckets(s)
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        best = math.min(best, sketch(r * width + bs(r)))
        r += 1
      }
      best
    }
  }

  def countMin(depth: Int = 4, width: Int = 1024): CountMinSketch =
    new CountMinSketch(depth, width)
}
