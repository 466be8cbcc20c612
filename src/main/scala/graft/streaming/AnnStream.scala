package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.EventEnvelope
import graft.operators.Ann

/** Streaming IVF ANN — the query-side face that completes
  * train-once/query-many on the ingest plane:
  *
  *  - TRAIN once offline: `Ann.kmeansTrain` -> `Artifacts.saveCentroids`.
  *  - ASSIGN once per corpus snapshot: `Ann.assignCells(corpus,
  *    centroids)` — the only corpus-wide pass, amortized over every
  *    query the stream will ever carry. Persist it via
  *    `Artifacts.saveIvfCells`; a fresh query session then feeds
  *    `loadIvfCells` straight into the relay (AnnStreamSpec pins
  *    loaded-vs-assigned hit equality).
  *  - QUERY forever: embedding queries arrive on a topic; each
  *    micro-batch runs `Ann.ivfTopKFromCells` — probe-pruned broadcast
  *    centroids (`Artifacts.loadIvfCentroids` feeds `centroids`
  *    directly), exact top-k inside the probed cells only — and the
  *    hits flow out on another topic, each stamped with its
  *    originating query's stamp (the same lineage contract as Map).
  *
  * Like HotSwap, the per-epoch work runs through `foreachBatch`: the
  * top-k rank needs a window function, which streaming plans do not
  * support, and the per-epoch BATCH plan is the exact `ivfTopKFromCells`
  * operator — so stream results equal the batch operator's on the same
  * query wave by construction (AnnStreamSpec pins it). Query waves ride
  * the broadcast side of every join involved, so collecting a wave to
  * build its frame is the same driver-bounded contract the batch path
  * already has.
  */
object AnnStream {

  /** One embedding query riding the stream. */
  final case class VecQuery(qId: Long, emb: Seq[Double])

  /** One embedding document riding the ingest stream. */
  final case class VecDoc(vecId: Long, emb: Seq[Double])

  /** Per-cell admitted-vector state for [[semDedupGate]]. */
  final case class SemCellState(admitted: Seq[Seq[Double]])

  /** One ANN hit: query, neighbor, r4-quantized cosine, rank (1-based). */
  final case class AnnHit(qId: Long, vecId: Long, score: Double, rn: Long)

  // Integer-quantized cosine, the JVM twin of Det.r4q(cosine(a, b)):
  // the same index-order fold as VectorExpressions.dot and the same
  // floor(x * 10000 + 0.5) quantization, so gate decisions use the
  // identical arithmetic as the batch operator's cuts.
  private def cosQ(a: Seq[Double], b: Seq[Double]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5).toLong
  }

  /** Streaming SemDeDup gate — the ingest-plane face of
    * [[Ann.semDedup]]: an arriving embedding is admitted iff no
    * ALREADY-ADMITTED vector in its cell has quantized cosine >=
    * thresholdQ. Cells come from the same broadcast-centroid argmax as
    * the batch operator (quantized affinity, cell-id tiebreak);
    * centroids are a driver-side k x dim array, typically
    * `Artifacts.loadIvfCentroids(...).collect()` — train once, gate
    * forever, hot-swappable at a batch boundary via the HotSwap
    * pattern.
    *
    * Semantics vs batch (documented, spec-pinned): the batch operator
    * sees all pairs at once and keeps the LESS-centroid-similar member;
    * a stream must decide per arrival, so FIRST arrival wins —
    * event-time order within each micro-batch (the same sorted repair
    * as every stateful op here), arrival order across batches. Pairs
    * split across cells pass unexamined — exactly the batch operator's
    * cell-local trade.
    *
    * State is per-cell and capped: each cell keeps at most `maxPerCell`
    * admitted vectors (the cell's SemDeDup index); once full, new
    * distinct vectors still pass but are no longer recorded, so
    * suppression recall degrades gracefully instead of state growing
    * without bound. At 100 TB the cap times k centroids bounds executor
    * state exactly like the batch operator's broadcast bounds.
    */
  def semDedupGate(centroids: Seq[(Long, Seq[Double])], thresholdQ: Long,
      maxPerCell: Int = 4096): TypedOps.Op[VecDoc, VecDoc] = { ds =>
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(centroids.nonEmpty, "semDedupGate needs at least one centroid")
    implicit val encState: Encoder[SemCellState] =
      ExpressionEncoder[SemCellState]()
    implicit val encOut: Encoder[EventEnvelope[VecDoc]] =
      ExpressionEncoder[EventEnvelope[VecDoc]]()
    implicit val encKey: Encoder[Long] = Encoders.scalaLong
    val cents = centroids.sortBy(_._1)
    def cellOf(v: Seq[Double]): Long =
      cents.maxBy { case (cid, c) => (cosQ(v, c), -cid) }._1
    ds.groupByKey(e => cellOf(e.content.emb))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EventEnvelope[VecDoc]],
         state: org.apache.spark.sql.streaming.GroupState[SemCellState]) =>
          var admitted = state.getOption
            .map(_.admitted.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[EventEnvelope[VecDoc]]
          it.toSeq.sortBy(_.stamp.start_time.getTime).foreach { ev =>
            val v = ev.content.emb
            val dup = admitted.exists(a => cosQ(a, v) >= thresholdQ)
            if (!dup) {
              out += ev
              if (admitted.size < maxPerCell) admitted :+= v
            }
          }
          state.update(SemCellState(admitted))
          out.result().iterator
      }
  }

  /** Start the relay: queries from `in`, per-batch IVF top-k over the
    * PRE-ASSIGNED `cells` (assignCells output) with `centroids`
    * (cell_id, cell_emb), hits to `out`.
    *
    * A wave is deduplicated by qId before planning: under
    * at-least-once redelivery the same query can appear twice in one
    * micro-batch, and duplicated q_id rows would inflate the
    * probe-side row_number (duplicates consuming nprobe slots and
    * top-k ranks). The FIRST event per qId in event-time order wins —
    * the same sorted repair every stateful op here applies — so a
    * redelivered query yields exactly one hit set carrying the
    * first-arrival stamp.
    */
  def ivfQueryRelay(in: Topic[VecQuery], out: Topic[AnnHit],
      cells: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int): StreamingQuery =
    in.stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventEnvelope[VecQuery]], _: Long) =>
        // Sort key carries a payload tiebreak: with time alone, two
        // DISTINCT payloads sharing a qId and an equal stamp would be
        // ordered by collect() arrival — a nondeterministic winner on
        // replay. (time, rendered embedding) is a total order over the
        // wave, so equal-stamp conflicts resolve identically every run.
        val evs = batch.collect().toSeq
          .sortBy(e => (e.stamp.start_time.getTime,
            e.content.emb.mkString(",")))
          .distinctBy(_.content.qId)
        if (evs.nonEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          val queries = evs
            .map(e => (e.content.qId, e.content.emb))
            .toDF("q_id", "q_emb")
          val hits = Ann
            .ivfTopKFromCells(cells, queries, centroids, k, nprobe)
            .collect()
          val stamps = evs.map(e => e.content.qId -> e.stamp).toMap
          out.publish(hits.toSeq.map { r =>
            EventEnvelope(stamps(r.getLong(0)),
              AnnHit(r.getLong(0), r.getLong(1), r.getDouble(2),
                r.getLong(3)))
          })
        }
        ()
      }
      .start()
}
