package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Artifacts, EventEnvelope}
import graft.operators.QualityModel

/** Hot artifact refresh on the LIVE ingest plane.
  *
  * The stateless gates (qualityModelGate, importanceGate,
  * decontaminationGate) bake their fitted artifact into the streaming
  * plan as literals — the right shape for a fixed model (map-only, no
  * join, no state), but a 100 TB pipeline re-fits its classifier weekly
  * and cannot restart every consumer to pick the new weights up. A
  * Structured Streaming plan is analyzed once at `start()` and never
  * re-resolves, so the swap point cannot live inside the streaming
  * plan; the Spark-native seam is `foreachBatch`, whose body constructs
  * a fresh BATCH plan every epoch.
  *
  * `classifierGateRelay` is that seam packaged as a topic-to-topic
  * component: subscribe to `in`, and each micro-batch (a) re-resolves
  * the LATEST artifact version with one filesystem listing (the weight
  * frame is re-read only when the version actually changed), (b) scores
  * the batch with the same r4-quantized cut as
  * `TypedOps.qualityModelGate` — a distributed batch job whose plan
  * embeds the current weights as literals — and (c) publishes survivors
  * to `out`. Swap semantics fall out of the epoch structure, with no
  * barrier protocol at all:
  *
  *  - version resolution happens exactly ONCE per epoch, so a bump
  *    takes effect at a batch boundary — no mid-batch mixed scoring;
  *  - every input event belongs to exactly one epoch and survivors are
  *    published exactly once — nothing is lost or duplicated by a swap
  *    (versions are immutable, so the old plan stays valid while it
  *    drains its own epoch);
  *  - publishing a NEW artifact version (Artifacts.save is
  *    errorifexists, so a version appears atomically-enough for the
  *    listing: either the directory is the new latest or it is not yet
  *    visible) is the whole control action — no RPC to the consumer.
  *
  * The same relay shape hot-swaps any Artifacts-backed gate (importance
  * LM, decontamination buckets, hashed-bigram classifier): only the
  * load call and the gate expression change. Compare
  * `PubSub.migrateTopic`, which swaps a topic's CONFIG under a drain
  * barrier — that path mutates shared topic state, so it needs the
  * monitor; this path swaps nothing shared (each epoch owns its plan),
  * so draining is unnecessary.
  */
object HotSwap {

  /** Handle on a running hot-swappable gate relay. */
  final class HotGate private[streaming] (
      val query: StreamingQuery,
      state: AtomicReference[(Int, QualityModel.Weights)]) {

    /** The artifact version the most recent epoch scored with (-1
      * before the first non-empty epoch).
      */
    def currentVersion: Int =
      Option(state.get()).map(_._1).getOrElse(-1)
  }

  /** Start the relay: `in` -> classifier gate at the LATEST
    * `Artifacts.ClassifierName` version under `root`, re-resolved per
    * micro-batch -> `out`. The artifact must exist before the first
    * event arrives (a gate with no model must fail loudly, not pass
    * everything).
    */
  def classifierGateRelay(in: Topic[String], out: Topic[String],
      root: String, minScore: Double): HotGate = {
    val minQ = math.round(minScore * 10000)
    val state = new AtomicReference[(Int, QualityModel.Weights)](null)
    val query = in.stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventEnvelope[String]], _: Long) =>
        val spark = batch.sparkSession
        val latest = Artifacts
          .versions(spark, root, Artifacts.ClassifierName).lastOption
          .getOrElse(throw new NoSuchElementException(
            s"no ${Artifacts.ClassifierName} artifact under $root — " +
              "fit and save one before starting the relay"))
        val cached = state.get()
        val w =
          if (cached != null && cached._1 == latest) cached._2
          else {
            val loaded = Artifacts.loadClassifier(spark, root, Some(latest))
            state.set((latest, loaded))
            loaded
          }
        val kept = batch.filter(
          floor(QualityModel.score(col("content"), w) * 10000 + 0.5)
            >= minQ).collect()
        out.publish(kept.toSeq)
        ()
      }
      .start()
    new HotGate(query, state)
  }
}
