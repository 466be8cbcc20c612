package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.queries.Det

/** DSIR importance-weight scoring as an OFFLINE ARTIFACT plus a map-only
  * scoring column — the production split of q_importance_weights (which
  * keeps the whole computation in one distributed plan): `fit` runs once
  * over a corpus and returns the <=256-entry bucket LM; `logw` embeds
  * that LM as a map literal in a per-row expression, so scoring — batch
  * OR streaming — is a stateless scan-stage pass with no join at all.
  * The streaming ingest gate (TypedOps.importanceGate) is exactly this
  * column in a filter, completing the batch<->ingest symmetry the dedup
  * family already has.
  *
  * ImportanceGateSpec pins the two formulations against each other:
  * the map-literal fold must reproduce q_importance_weights' logw for
  * every document, and the streamed gate must pass exactly the docs the
  * batch filter passes.
  */
object Importance {

  val Buckets = 256

  /** md5-derived feature bucket (first two hex digits) — identical to
    * q_importance_weights' bucketing, reproducible in any engine.
    */
  def bucket(token: Column): Column =
    conv(substring(md5(token.cast("binary")), 1, 2), 16, 10).cast("long")

  /** The fitted artifact: i4-quantized log-ratio per seen bucket, plus
    * the default for buckets unseen in BOTH distributions (add-one
    * smoothing gives those log((1/(tt+B)) / (1/(ts+B))) — not zero).
    */
  final case class Lm(dw: Map[Long, Long], default: Long)

  /** One corpus pass (the q_importance_weights LM subplan) collapsed to
    * the <=B-row artifact. `isTarget` marks the target slice.
    */
  def fit(docs: DataFrame, textCol: Column, isTarget: Column): Lm = {
    val counts = docs
      .select(isTarget.as("is_tgt"),
        explode(TextFunctions.tokens(textCol)).as("token"))
      .select(col("is_tgt"), bucket(col("token")).as("b"))
      .groupBy("b").agg(
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_tgt"), 1L).otherwise(0L)).as("cs"))
      .collect()
    val tt = counts.map(_.getLong(1)).sum.toDouble
    val ts = counts.map(_.getLong(2)).sum.toDouble
    def q(n: Long, tot: Double): Long =
      math.floor(math.log((n + 1) / (tot + Buckets)) * 10000 + 0.5).toLong
    Lm(
      counts.map(r => r.getLong(0) -> (q(r.getLong(1), tt) - q(r.getLong(2), ts))).toMap,
      q(0, tt) - q(0, ts))
  }

  /** Per-row log importance weight under a fitted LM: the i4 bucket
    * ratios summed over tokens (integer, order-independent), then r4 —
    * the same arithmetic as q_importance_weights, but with the LM as
    * per-expression constant state instead of a join (one native pass
    * per row, graft.expressions.ImportanceLogw; also the SQL surface
    * `graft_importance_logw`).
    */
  def logw(text: Column, lm: Lm): Column =
    graft.expressions.ImportanceLogw(text, lm.dw, lm.default)
}
