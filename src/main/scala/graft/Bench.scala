package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Bench main: runs the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line. Each query gets
  * one untimed warmup pass (JIT + parquet footer cache) and
  * SPARK_GRAFT_BENCH_REPS timed attempts (default 3) of which the MIN is
  * reported — host scheduling noise on this box is ±25% run-to-run (with
  * occasional multi-second bursts during concurrent judging), and the
  * minimum of independent cache-isolated attempts estimates the query's
  * actual cost rather than the noise floor. Attempts are interleaved
  * rep-major across the suite so one burst cannot inflate every attempt
  * of the same query; three passes mean a burst must span TWO full
  * suite passes (~35 s) to survive min() — round 6's first-positioned
  * query (q1_pricing 2.75 s driver vs 1.05 s quiet/focused) showed two
  * passes were not always enough under concurrent judging.
  *
  * Rep-major min-of-3 defeats BURSTS but not SUSTAINED contention: the
  * round-8 driver run was contended for its whole 5½-minute wall (vs
  * ~2 min quiet), so all three attempts of q_ngram_jaccard landed
  * inflated (recorded 6.79 s, quiet 1.49 s). The countermeasure is
  * convergence-driven sampling: after the base rounds, any query whose
  * two BEST attempts still disagree by more than 15% gets additional
  * rep-major rounds (unconverged queries only, up to
  * SPARK_GRAFT_BENCH_MAX_REPS total, default 8). Under a quiet host the
  * base rounds converge and nothing extra runs; under contention the
  * run keeps sampling past the contention window instead of recording
  * it. Queries still unconverged at the cap are listed in the
  * `unconverged` JSON field so a reader knows those minima are
  * upper bounds, not settled figures.
  *
  * Failures are loud: a throwing query is reported in the `errors` field
  * and excluded from `queries`/the total, never silently scored as fast.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      .max(1)
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Force FULL evaluation of every output column via the noop sink:
    // count() lets Catalyst prune the final projections, so a query
    // whose cost lives in computed columns (quantization arithmetic,
    // rounded scores) would be timed as little more than a row count —
    // and an ANSI error in a projected column would never fire.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // SPARK_GRAFT_BENCH_ALL=1 sweeps the ENTIRE query catalog instead of
    // the headliners — the per-round regression radar for queries that
    // don't headline the bench (this is how the interpreted-fallback
    // simhash/fingerprint paths were caught).
    val pool =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries
      else SparkEntry.benchQueries
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b narrows to named queries (any
    // catalog entry, headliner or not) for focused re-measurement.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val qs = only match {
      case Some(names) =>
        SparkEntry.queries.view.filterKeys(names).toSeq.sortBy(_._1)
      case None => pool.toSeq.sortBy(_._1)
    }
    qs.foreach { case (name, fn) =>
      try run(fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: $e")
      }
    }
    // Per-attempt cache isolation: CacheManager substitutes any cached
    // identical plan fragment, so without the clear a timed attempt would
    // silently reuse intermediates cached by the warmup pass, an earlier
    // timed query (e.g. the shingle sets shared by the minhash and
    // jaccard paths), or its own previous attempt, and skip its
    // scan+compute cost. Each attempt below is therefore self-contained:
    // scan + compute + the query's own intra-query caches. (Steady-state
    // cache reuse on a long-lived cluster is real, but benching it makes
    // per-query figures order-dependent and unfalsifiable.)
    //
    // Attempts are REP-MAJOR (rep 1 of every query, then rep 2, ...):
    // back-to-back attempts of the same query both land inside any
    // multi-second host-contention burst, so the burst survives min();
    // spacing a query's attempts a full suite pass apart decorrelates
    // them, and min() then recovers the uncontended cost.
    // Sacrifice attempt: run the FIRST query once more under the exact
    // timed regime (clearCache + noop write) before timing starts. The
    // first timed position is the only one whose predecessor is the
    // warmup phase rather than another timed attempt — any cost unique
    // to that transition (first post-clearCache planning, committer or
    // codegen-cache state the warmup pass left different) lands here
    // instead of inside the alphabetically-first query's figure.
    qs.headOption.foreach { case (_, fn) =>
      spark.catalog.clearCache()
      try run(fn) catch { case _: Throwable => () }
    }
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPS", "8").toInt
      .max(reps)
    val samples = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val failed = collection.mutable.LinkedHashSet.empty[String]
    // A query has converged when its two best attempts agree within 15%:
    // the min is then corroborated by an independent attempt and is not
    // a lone lucky (or, under contention, a lone unlucky) sample.
    def converged(name: String): Boolean = {
      val best = samples(name).sorted.take(2)
      best.size >= 2 && best(1) <= best(0) * 1.15
    }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        run(fn)
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failed += name
      }
    }
    for (_ <- 1 to reps; (name, fn) <- qs if !failed(name)) timeOne(name, fn)
    // Convergence rounds: rep-major over the still-unconverged subset
    // only, so a mostly-quiet run doesn't re-pay the whole suite for one
    // noisy query.
    for (_ <- reps + 1 to maxReps) {
      val pending = qs.filter { case (n, _) => !failed(n) && !converged(n) }
      if (pending.nonEmpty) pending.foreach { case (n, f) => timeOne(n, f) }
    }
    val results = qs.collect {
      case (name, _) if !failed(name) => name -> samples(name).min
    }.toVector
    val errors = failed.toVector
    val unconverged = qs.collect {
      case (name, _) if !failed(name) && !converged(name) => name
    }.toVector
    val qJson = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val uncJson = unconverged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"errors":$errJson,"unconverged":$uncJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
