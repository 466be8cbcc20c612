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
  *    query the stream will ever carry (persist it like any artifact).
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

  /** One ANN hit: query, neighbor, r4-quantized cosine, rank (1-based). */
  final case class AnnHit(qId: Long, vecId: Long, score: Double, rn: Long)

  /** Start the relay: queries from `in`, per-batch IVF top-k over the
    * PRE-ASSIGNED `cells` (assignCells output) with `centroids`
    * (cell_id, cell_emb), hits to `out`.
    */
  def ivfQueryRelay(in: Topic[VecQuery], out: Topic[AnnHit],
      cells: DataFrame, centroids: DataFrame, k: Int,
      nprobe: Int): StreamingQuery =
    in.stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventEnvelope[VecQuery]], _: Long) =>
        val evs = batch.collect()
        if (evs.nonEmpty) {
          val spark = batch.sparkSession
          import spark.implicits._
          val queries = evs.toSeq
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
