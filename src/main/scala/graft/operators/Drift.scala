package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Population-stability (PSI) drift primitives shared by the batch
  * monitor (q_quality_drift) and the streaming per-window monitor
  * (TemporalOps.qualityDriftByWindow): a fixed 5-bin grid over the
  * quality score, a baseline-share artifact fitted offline, and the
  * smoothed per-bin PSI term. PSI > 0.25 summed over bins is the
  * conventional retrain/alert line.
  */
object Drift {

  val Bins = 5

  /** Quality bin on the fixed grid (floor, top bin closed). */
  def qualityBin(text: Column): Column =
    least(floor(TextFunctions.qualityScore(text) * Bins).cast("long"),
      lit(Bins - 1L))

  /** Baseline bin shares fitted from a reference corpus — the offline
    * artifact (Bins numbers to the driver), add-half smoothed so a
    * later PSI against it is always finite.
    */
  def fitBaseline(docs: DataFrame, textCol: Column): Seq[Double] = {
    val counts = docs.select(qualityBin(textCol).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    (0 until Bins).map(b =>
      (counts.getOrElse(b.toLong, 0L) + 0.5) / (total + Bins * 0.5))
  }

  /** Smoothed observed share for one bin: (n_bin + 0.5)/(n + Bins/2). */
  def smoothedShare(nBin: Column, nTotal: Column): Column =
    (nBin + 0.5) / (nTotal + Bins * 0.5)

  /** PSI term of an observed share against a baseline share. */
  def psiTerm(p: Column, q: Double): Column =
    (p - q) * log(p / q)
}
