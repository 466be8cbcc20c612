package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.core.Sessions
import graft.operators.Ann
import graft.queries.Tables

/** The fixture-embeddings contrast for the mult=100 bench's one
  * super-linear member: the r13-era q_embed_neardup ran the FIXED 16x8 scheme
  * (pinned for its engine-portable oracle), whose candidate volume is
  * quadratic in the corpus — 383x for 100x data measured. This main
  * times the identical operator under the fixed scheme and under the
  * lshPlan auto-sized scheme on the SAME embeddings table, so SCALE.md
  * can quote the repair, not just the diagnosis. Candidate volume is
  * threshold-independent (bands collide before verification cuts), so
  * the default threshold 0.95 is the production near-dup setting.
  *
  * Usage: runMain graft.AutoNearDupBench <sfDir> [threshold] [reps]
  * — prints one JSON line with min-of-reps wall times and pair counts.
  */
object AutoNearDupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.95
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val dim = emb.head().getSeq[Float](1).length
    val plan = Ann.lshPlan(n, threshold)

    def timed(f: => Long): (Double, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def minOf(f: => Long): (Double, Long) =
      (1 to reps).map(_ => timed(f)).minBy(_._1)

    val (fixedSec, fixedPairs) = minOf(
      Ann.nearDupPairs(emb, dim, threshold, nBands = 16, bitsPerBand = 8,
        maxBucket = Long.MaxValue).count())
    // the plan computed above is the plan that RUNS (nearDupPairsPlanned
    // takes it verbatim), so the JSON's auto_bits/auto_bands report the
    // timed scheme by construction — no second count()/re-plan that
    // could drift from the printed figures
    val (autoSec, autoPairs) = minOf(
      Ann.nearDupPairsPlanned(emb, dim, threshold, plan,
        maxBucket = Long.MaxValue).count())

    println(s"""{"metric":"auto_neardup","sf":"$sfDir","n":$n,""" +
      s""""dim":$dim,"threshold":$threshold,""" +
      f""""fixed_sec":$fixedSec%.2f,"fixed_pairs":$fixedPairs,""" +
      f""""auto_sec":$autoSec%.2f,"auto_pairs":$autoPairs,""" +
      s""""auto_bits":${plan.bitsPerBand},"auto_bands":${plan.nBands},""" +
      f""""auto_recall":${plan.expectedRecall}%.4f}""")
    spark.stop()
  }
}
