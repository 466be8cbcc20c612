package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Artifacts, EventEnvelope}
import graft.operators.{Decontamination, Importance, QualityModel}

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
  * [[gateRelay]] is that seam packaged as a GENERIC topic-to-topic
  * component, parameterized by the artifact codec and the gate
  * predicate: subscribe to `in`, and each micro-batch (a) re-resolves
  * the LATEST artifact version with one filesystem listing (the
  * artifact is re-read only when the version actually changed),
  * (b) gates the batch with a distributed batch job whose plan embeds
  * the current artifact as literals, and (c) publishes survivors to
  * `out`. Swap semantics fall out of the epoch structure, with no
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
  * Shipped instantiations cover the three Artifacts-backed stateless
  * gates: [[classifierGateRelay]] (quality weights),
  * [[importanceGateRelay]] (DSIR LM), [[decontaminationGateRelay]]
  * (eval-bucket set) — each is one load call plus one gate expression,
  * which is the whole point of the seam. Compare `PubSub.migrateTopic`,
  * which swaps a topic's CONFIG under a drain barrier — that path
  * mutates shared topic state, so it needs the monitor; this path swaps
  * nothing shared (each epoch owns its plan), so draining is
  * unnecessary.
  */
object HotSwap {

  /** Handle on a running hot-swappable gate relay. */
  final class HotGate[A] private[streaming] (
      val query: StreamingQuery,
      state: AtomicReference[(Int, A)]) {

    /** The artifact version the most recent epoch gated with (-1
      * before the first non-empty epoch).
      */
    def currentVersion: Int =
      Option(state.get()).map(_._1).getOrElse(-1)
  }

  /** Start a hot-swappable gate relay: `in` -> gate under the LATEST
    * `artifactName` version beneath `root`, re-resolved per
    * micro-batch -> `out`. `loadVersion` materializes one artifact
    * version (cached until the version changes); `gate` filters an
    * epoch's batch under that artifact. The artifact must exist before
    * the first event arrives (a gate with no model must fail loudly,
    * not pass everything).
    */
  def gateRelay[A](in: Topic[String], out: Topic[String], root: String,
      artifactName: String, loadVersion: (SparkSession, Int) => A)(
      gate: (Dataset[EventEnvelope[String]], A) =>
        Dataset[EventEnvelope[String]]): HotGate[A] = {
    val state = new AtomicReference[(Int, A)](null)
    val query = in.stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[EventEnvelope[String]], _: Long) =>
        val spark = batch.sparkSession
        val latest = Artifacts.versions(spark, root, artifactName).lastOption
          .getOrElse(throw new NoSuchElementException(
            s"no $artifactName artifact under $root — " +
              "fit and save one before starting the relay"))
        val cached = state.get()
        val a =
          if (cached != null && cached._1 == latest) cached._2
          else {
            val loaded = loadVersion(spark, latest)
            state.set((latest, loaded))
            loaded
          }
        out.publish(gate(batch, a).collect().toSeq)
        ()
      }
      .start()
    new HotGate(query, state)
  }

  /** Quality-classifier instantiation: the r4-quantized sigmoid cut of
    * `TypedOps.qualityModelGate` over the latest
    * `Artifacts.ClassifierName` weights.
    */
  def classifierGateRelay(in: Topic[String], out: Topic[String],
      root: String, minScore: Double): HotGate[QualityModel.Weights] = {
    val minQ = math.round(minScore * 10000)
    gateRelay(in, out, root, Artifacts.ClassifierName,
      (s, v) => Artifacts.loadClassifier(s, root, Some(v))) { (batch, w) =>
      batch.filter(
        floor(QualityModel.score(col("content"), w) * 10000 + 0.5) >= minQ)
    }
  }

  /** DSIR importance-LM instantiation: `TypedOps.importanceGate`'s
    * log-weight cut over the latest `Artifacts.ImportanceLmName` LM —
    * re-fit the proxy LM on fresh target data, save a version, and
    * every relay picks it up at its next epoch.
    */
  def importanceGateRelay(in: Topic[String], out: Topic[String],
      root: String, minLogw: Double): HotGate[Importance.Lm] =
    gateRelay(in, out, root, Artifacts.ImportanceLmName,
      (s, v) => Artifacts.loadImportanceLm(s, root, Some(v))) { (batch, lm) =>
      batch.filter(Importance.logw(col("content"), lm) >= minLogw)
    }

  /** Decontamination instantiation: `TypedOps.decontaminationGate`'s
    * shared-bucket cut over the latest `Artifacts.EvalBucketsName` set
    * — grow the eval suite, save a version, and newly-contaminated
    * documents are blocked from the next epoch on.
    */
  def decontaminationGateRelay(in: Topic[String], out: Topic[String],
      root: String, nGram: Int = 3, minShared: Int = 2)
      : HotGate[Set[Long]] =
    gateRelay(in, out, root, Artifacts.EvalBucketsName,
      (s, v) => Artifacts.loadEvalBuckets(s, root, Some(v))) { (batch, bk) =>
      batch.filter(
        Decontamination.hitCount(col("content"), bk, nGram) < minShared)
    }
}
