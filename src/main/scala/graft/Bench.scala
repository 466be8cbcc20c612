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
  *
  * LOAD SENTINEL — the run self-identifies contention instead of asking
  * the reader to guess (round 9: a 3.15x phantom "regression"; round
  * 10: a 3x phantom "win" — both were ambient load, provable only by
  * re-running quiet). A fixed tiny probe job (sum of xxhash64 over a
  * small range — scan-free, table-free, the same plan every time) runs
  * after every timed attempt; the probe's cost under a quiet host is
  * the run's own global minimum probe time, so each attempt carries a
  * dimensionless load ratio (probe_after / probe_min). The JSON gains:
  *  - "load": per query, the ratio attached to the attempt that
  *    produced the reported min — >~1.5 means the recorded figure was
  *    taken under contention and is an upper bound, not a cost;
  *  - "probe_base_sec": the global-min probe cost (cross-round
  *    comparable on the same host);
  *  - "wall_sec": timed-phase wall clock, so wall/measured no longer
  *    needs the driver's logs.
  * A run contended from first probe to last would normalize its own
  * baseline (ratios ~1), so the baseline is CROSS-RUN: the lowest
  * probe time ever observed on this host persists in
  * bench_probe_cal.txt (repo-tracked, self-healing — any quieter run
  * lowers it) and the effective base is min(calibrated, this run).
  * A uniformly loaded run therefore still shows load > 1 on every
  * query — the round-9/-10 failure mode (sustained contention that
  * rep-major min-of-3 cannot dodge) is now visible in the artifact
  * itself. Reading guide: load <= ~1.15 quiet; >= ~1.4 means the
  * reported min was taken under contention and is an upper bound.
  *
  * When the suite-MEDIAN load ratio exceeds 1.5 the run does not stop at
  * labeling itself contaminated: it re-sweeps the whole suite (up to
  * SPARK_GRAFT_BENCH_RETRIES extra passes, default 2), accumulating
  * attempts so minima only improve, and publishes "retries" and
  * "load_median" so the artifact records whether the dodge succeeded.
  */
object Bench {
  /** Locale-pinned numeric formatting for every JSON-bound number: the
    * f-interpolator formats through the default JVM locale, so under a
    * comma-decimal locale it writes `0,794` and breaks JSON validity
    * (of the radar line, the quiet-baseline file and the calibration
    * file alike).
    */
  private def jnum(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(v))

  /** Short HEAD commit for restamp provenance — a baseline row rewritten
    * without the commit it was measured on cannot later be re-adjudicated
    * the way the r14 judge re-adjudicated q1_pricing (rebuild the old
    * commit, re-measure, decide drift-vs-regression).
    */
  private def headCommit: String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
    } catch { case _: Exception => "unknown" }

  def main(args: Array[String]): Unit = {
    graft.core.Sessions.assertJdkOpens()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
      .max(1)
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.quietSupersededCheckpointWarnings()

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
    // Load-sentinel probe: a fixed, scan-free job — one plan, no table,
    // ~60 ms quiet — whose elapsed time is a pure function of ambient
    // host load. Raw seconds are collected; ratios are computed post
    // hoc against the run's global minimum.
    val probeTimes = collection.mutable.ArrayBuffer.empty[Double]
    def probe(): Double = {
      // max, not sum: xxhash64 spans the full long range and an ANSI
      // sum of 8M of them overflows; max keeps the identical per-row
      // hash work without the trap.
      import org.apache.spark.sql.functions.{col, max, xxhash64}
      val t0 = System.nanoTime()
      spark.range(0L, 8000000L, 1L, cpus)
        .select(max(xxhash64(col("id")))).head()
      val s = (System.nanoTime() - t0) / 1e9
      probeTimes += s
      s
    }
    // JIT/codegen warm for the probe plan: the probe floor keeps
    // dropping for the first handful of executions (C2 compilation of
    // the generated code), and the contention-retry decision below
    // compares against the CROSS-RUN floor — under-warmed probes read
    // as phantom 2x "load" on an idle host (observed on a focused run:
    // mid-run medians 2.1-2.3, final converged 1.36). Eight executions
    // puts the plan at steady state for ~0.5 s.
    (1 to 8).foreach(_ => probe())
    probeTimes.clear()
    (1 to 3).foreach(_ => probe()) // opening baseline samples
    val samples =
      collection.mutable.Map.empty[String, Vector[(Double, Double)]]
        .withDefaultValue(Vector.empty)
    val failed = collection.mutable.LinkedHashSet.empty[String]
    // A query has converged when its two best attempts agree within 15%:
    // the min is then corroborated by an independent attempt and is not
    // a lone lucky (or, under contention, a lone unlucky) sample.
    def converged(name: String): Boolean = {
      val best = samples(name).map(_._1).sorted.take(2)
      best.size >= 2 && best(1) <= best(0) * 1.15
    }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        run(fn)
        val elapsed = (System.nanoTime() - t0) / 1e9
        samples(name) = samples(name) :+ (elapsed, probe())
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          failed += name
      }
    }
    // Cross-run calibration: the quietest probe this HOST has ever
    // shown, so a uniformly-contended run cannot normalize itself.
    // (Read before the timed phase: the contention-retry loop below
    // needs the calibrated base to judge its own pass.)
    val calPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PROBE_CAL", "bench_probe_cal.txt"))
    val calibrated = try {
      val s = new String(java.nio.file.Files.readAllBytes(calPath))
      s.linesIterator.map(_.trim).find(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.toDouble)
    } catch { case _: Exception => None }
    // The run's own 10th-percentile probe, NOT its minimum: a single
    // freak-fast sample used to set the floor (observed: one 0.0356 s
    // sample on a host whose steady-state probe mode is ~0.06 s), after
    // which every later probe read "load ~1.9" on an idle machine — the
    // contention auto-retry fired on every radar, and the staleness
    // rule's quiet-gate became unattainable. p10 is robust to the
    // outlier tail while still tracking a genuinely quieter host.
    def runP10: Double = {
      val s = probeTimes.sorted
      if (s.isEmpty) Double.MaxValue
      else s(math.round((s.size - 1) * 0.10).toInt)
    }
    // Effective quiet base = min(cross-run calibration, run p10) —
    // UNLESS the stored calibration is itself a stale outlier (below
    // 0.7x a well-sampled run's p10, i.e. a floor this host cannot
    // actually attain in steady state), in which case the run's p10
    // wins and the calibration file is re-stamped UP at exit.
    def probeBaseNow: Double = {
      val p10 = runP10
      calibrated match {
        case Some(c) if c < p10 * 0.7 && probeTimes.size >= 40 => p10
        case Some(c) => math.min(c, p10)
        case None => p10
      }
    }
    // Median load ratio attached to the CURRENT per-query min attempts —
    // the run-level contention verdict (per-query ratios catch a burst;
    // the median catches the round-8 failure mode, sustained contention
    // across the whole wall).
    def medianLoad: Double = {
      val loads = qs.collect {
        case (n, _) if !failed(n) && samples(n).nonEmpty =>
          samples(n).minBy(_._1)._2 / probeBaseNow
      }.sorted
      if (loads.isEmpty) 1.0
      else loads(loads.size / 2)
    }
    val wallT0 = System.nanoTime()
    for (_ <- 1 to reps; (name, fn) <- qs if !failed(name)) timeOne(name, fn)
    // Convergence rounds: rep-major over the still-unconverged subset
    // only, so a mostly-quiet run doesn't re-pay the whole suite for one
    // noisy query.
    for (_ <- reps + 1 to maxReps) {
      val pending = qs.filter { case (n, _) => !failed(n) && !converged(n) }
      if (pending.nonEmpty) pending.foreach { case (n, f) => timeOne(n, f) }
    }
    // Contention auto-retry: when the suite-median load ratio says the
    // whole run was contended (>1.5 — every min is an upper bound, not
    // a cost), re-sweep the full suite instead of publishing the
    // contaminated pass. All attempts accumulate, so the retry can only
    // lower minima; it stops as soon as the medians say quiet. The
    // retry count is published ("retries") so a reader of a still-hot
    // artifact knows the run already tried to dodge the load and the
    // figures are bounds.
    val retriesMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt.max(0)
    // One rep-major pass per retry (not `reps` passes): each pass gives
    // every query one fresh shot at a quieter min, and bounding the
    // retry at one pass keeps worst-case wall at (reps + retriesMax)
    // suite passes instead of reps * (1 + retriesMax).
    var retries = 0
    while (retries < retriesMax && medianLoad > 1.5) {
      retries += 1
      System.err.println(
        f"[bench] median load ${medianLoad}%.2f > 1.5 — contended run, " +
          s"retry $retries/$retriesMax")
      for ((name, fn) <- qs if !failed(name)) timeOne(name, fn)
    }
    // Radar self-adjudication: every round-over-round "regression" the
    // r13 radar reported (six queries >1.15x) was a load artifact that
    // had to be hand-re-measured with a focused quiet pass the NEXT
    // round. Automate that discipline in-run: any query whose current
    // min reads >1.15x its QUIETEST-EVER recorded figure (the committed
    // bench_quiet_baseline.json, self-healing downward exactly like the
    // probe calibration) gets up to 5 extra rep-major attempts now, and
    // BOTH figures are published under "quiet_minima" — the reader (and
    // next round's judge) sees radar-vs-focused without re-running
    // anything. Still-hot entries after the focused pass are real
    // regressions (or a genuinely contended host, visible via "load").
    val quietPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
        "bench_quiet_baseline.json"))
    // The baseline is SF-SCOPED (its "__sf" key records the fixture it
    // was measured on): a run against any OTHER fixture — the sf0.01
    // smoke, a /tmp mult fixture — neither triggers focused passes
    // (at mult=100 EVERY query reads >1.15x the sf0.1 row and the
    // "focused" pass would quintuple the most expensive queries) nor
    // self-heals the file with incomparable figures.
    val quietRaw = try {
      Some(new String(java.nio.file.Files.readAllBytes(quietPath)))
    } catch { case _: Exception => None }
    val quietSf = quietRaw.flatMap(s =>
      """"__sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1)))
    val sfMatches = quietSf.forall(_ == sfDir)
    // Flat numeric rows split three ways: plain keys are query figures;
    // "__stale_<q>" rows are consecutive-stale counters for the
    // staleness rule below; "__restamp_<q>" rows are string-valued
    // provenance left by past re-stamps (preserved verbatim on rewrite;
    // their values use '=' separators and no colons so the numeric
    // regex cannot misread their interiors as rows).
    val allNum: Map[String, Double] =
      if (!sfMatches) Map.empty
      else quietRaw.fold(Map.empty[String, Double]) { s =>
        """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(s)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    val quietBase: Map[String, Double] =
      allNum.filterNot(_._1.startsWith("__"))
    val staleIn: Map[String, Int] = allNum.collect {
      case (k, v) if k.startsWith("__stale_") =>
        k.stripPrefix("__stale_") -> v.toInt
    }
    val restampIn: Map[String, String] =
      quietRaw.fold(Map.empty[String, String]) { s =>
        """"(__restamp_[^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(s)
          .map(m => m.group(1) -> m.group(2)).toMap
      }
    val flagged = qs.filter { case (n, _) =>
      !failed(n) && samples(n).nonEmpty &&
        quietBase.get(n).exists(b => samples(n).map(_._1).min > b * 1.15)
    }
    val radarMins =
      flagged.map { case (n, _) => n -> samples(n).map(_._1).min }.toMap
    if (flagged.nonEmpty) {
      System.err.println(s"[bench] ${flagged.size} queries read >1.15x " +
        s"their quiet baseline — focused min-of-5 pass: " +
        flagged.map(_._1).mkString(", "))
      for (_ <- 1 to 5; (n, f) <- flagged if !failed(n)) timeOne(n, f)
    }
    val wallSec = (System.nanoTime() - wallT0) / 1e9
    probe() // closing baseline sample
    val probeBase = probeBaseNow
    try java.nio.file.Files.write(calPath,
      ("# graft Bench load-sentinel calibration: quietest ATTAINABLE probe\n" +
        "# seconds on this host — min over runs of each run's p10 probe\n" +
        "# (see Bench.scala). Self-healing both ways: a quieter run lowers\n" +
        "# it; a run whose p10 shows the stored floor was an outlier\n" +
        "# sample (< 0.7x p10) re-stamps it up.\n" +
        jnum("%.4f", probeBase) + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] calibration write failed: $e") }
    val results = qs.collect {
      case (name, _) if !failed(name) => name -> samples(name).minBy(_._1)
    }.toVector
    val errors = failed.toVector
    val unconverged = qs.collect {
      case (name, _) if !failed(name) && !converged(name) => name
    }.toVector
    val qJson = results
      .map { case (k, (v, _)) => "\"" + k + "\":" + jnum("%.3f", v) }
      .mkString("{", ",", "}")
    val loadJson = results
      .map { case (k, (_, p)) => "\"" + k + "\":" + jnum("%.2f", p / probeBase) }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val uncJson = unconverged.map("\"" + _ + "\"").mkString("[", ",", "]")
    // quiet_minima: radar figure (min before the focused pass), the
    // focused-pass result (overall min now), and the baseline row the
    // 1.15x trigger compared against.
    val qmJson = flagged.map { case (n, _) =>
      val quietMin = samples(n).map(_._1).min
      "\"" + n + "\":" +
        s"""{"radar":${jnum("%.3f", radarMins(n))},""" +
        s""""quiet_min":${jnum("%.3f", quietMin)},""" +
        s""""baseline":${jnum("%.3f", quietBase(n))}}"""
    }.mkString("{", ",", "}")
    // STALENESS RULE (round 15): the only-ever-lowers convention cannot
    // recover from a baseline row the host can no longer reproduce
    // (r14's q1_pricing: recorded 0.453 s, but quiet focused min-of-5
    // reads ~0.875 s on HEAD *and* on the r13 commit rebuilt — host
    // drift, and the row would re-flag ~1.9x every round forever). A
    // flagged row whose focused QUIET re-measurement (min attempt load
    // <= 1.4, so contention cannot fake it) still reads >= 1.5x the
    // baseline increments a "__stale_<q>" counter in the baseline file;
    // K consecutive such rounds (SPARK_GRAFT_BASELINE_STALE_K, default
    // 2) re-stamp the row UP to the measured quiet minimum and record
    // provenance in a "__restamp_<q>" string row (date, load, probe
    // base, old/new — '='-separated, colon-free, so the flat numeric
    // parse above can never misread it). A flagged row that converges
    // back under 1.5x resets its counter: only *consecutive* quiet
    // confirmations restamp. Rows not exercised by this run (focused
    // SPARK_GRAFT_BENCH_ONLY subsets, headliner-only runs) keep their
    // counters untouched.
    val staleK = sys.env.getOrElse("SPARK_GRAFT_BASELINE_STALE_K", "2")
      .toInt.max(1)
    val staleObserved = flagged.collect {
      case (n, _) if !failed(n) && samples(n).nonEmpty =>
        val (quietMin, probeAt) = samples(n).minBy(_._1)
        val quietLoad = probeAt / probeBase
        n -> (quietMin, quietLoad,
          quietLoad <= 1.4 && quietMin >= quietBase(n) * 1.5)
    }.toMap
    val staleNext: Map[String, Int] = {
      val updates = results.flatMap { case (n, _) =>
        staleObserved.get(n) match {
          // quiet focused pass still >= 1.5x: one more stale round
          case Some((_, _, true)) =>
            Some(n -> (staleIn.getOrElse(n, 0) + 1))
          // quiet focused pass converged back under 1.5x: reset
          case Some((_, ql, false)) if ql <= 1.4 => Some(n -> 0)
          // flagged but the focused min was itself contended: the round
          // is EVIDENCE-FREE — keep the counter as it was (resetting
          // here would let ambient load launder a genuinely stale row
          // forever; incrementing would let load manufacture a restamp)
          case Some(_) => staleIn.get(n).map(n -> _)
          // ran and read <= 1.15x baseline (not flagged at all): reset
          case None => Some(n -> 0)
        }
      }.toMap
      ((staleIn -- results.map(_._1)) ++ updates).filter(_._2 > 0)
    }
    // A restamp requires the counter at K AND this round's own focused
    // observation to be quiet-stale — a counter carried through
    // contended rounds must not restamp with a contended figure.
    //
    // DRIFT-vs-REGRESSION GATE (round 16): the K-consecutive-quiet rule
    // alone absorbs a genuine code regression that persists K rounds —
    // drift and regression look identical to it. The r14 judge's
    // q1_pricing adjudication distinguished them the only way possible:
    // rebuild a PRIOR commit and re-measure the same query on the same
    // host. That step is now mandatory: a restamp additionally requires
    // a row in bench_drift_probe.json (written by tools/drift_probe.sh,
    // which builds the prior round's commit in a scratch worktree and
    // runs focused quiet SPARK_GRAFT_BENCH_ONLY passes on BOTH commits
    // back-to-back). The paired, same-context measurement decides:
    //  - HEAD >= 1.3x the old commit  -> the slowdown arrived with the
    //    code: restamp REFUSED, published under "regression_suspected";
    //  - both commits >= 1.35x the baseline -> the HOST moved: restamp
    //    proceeds, provenance records both commits and both figures;
    //  - the old commit still reaches the baseline (< 1.35x) and HEAD
    //    matches it -> the radar figure was full-suite-context
    //    inflation, not staleness: no restamp, counter RESET (the first
    //    probe run hit exactly this — q_sessions read 0.359 s focused
    //    on BOTH builds vs 0.469 s inside the 119-query radar).
    // A missing or contended probe row defers the restamp and prints
    // the exact command to run.
    val probePath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_DRIFT_PROBE", "bench_drift_probe.json"))
    final case class DriftProbe(commit: String, oldMin: Double,
        oldLoad: Double, headC: String, headMin: Double, headLoad: Double)
    val driftProbe: Map[String, DriftProbe] = {
      val raw = try {
        Some(new String(java.nio.file.Files.readAllBytes(probePath),
          java.nio.charset.StandardCharsets.UTF_8))
      } catch { case _: Exception => None }
      raw.fold(Map.empty[String, DriftProbe]) { s =>
        """"([^"_][^"]*)"\s*:\s*\{([^}]*)\}""".r.findAllMatchIn(s).flatMap { m =>
          val body = m.group(2)
          def str(k: String) =
            (s""""$k"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(body).map(_.group(1))
          def num(k: String) =
            (s""""$k"\\s*:\\s*([0-9.eE+-]+)""").r.findFirstMatchIn(body)
              .map(_.group(1).toDouble)
          for (c <- str("commit"); v <- num("min_sec"); l <- num("load");
               hc <- str("head_commit"); hv <- num("head_min_sec");
               hl <- num("head_load"))
            yield m.group(1) -> DriftProbe(c, v, l, hc, hv, hl)
        }.toMap
      }
    }
    val head = headCommit
    val restampCandidates = staleNext.collect {
      case (n, k) if k >= staleK && staleObserved.get(n).exists(_._3) => n -> k
    }
    val regressionSuspected = collection.mutable.ArrayBuffer.empty[String]
    val probeResets = collection.mutable.Set.empty[String]
    val restamps: Map[String, (Double, String)] =
      restampCandidates.flatMap { case (n, k) =>
        val (quietMin, quietLoad, _) = staleObserved(n)
        val b = quietBase(n)
        // A probe row only authorizes a verdict about the build it
        // actually measured: rows whose head_commit is not the current
        // HEAD are treated as missing (DEFERRED), otherwise a probe
        // written rounds ago would certify drift for a regression that
        // shipped after it ran.
        driftProbe.get(n).filter(_.headC == head) match {
          // probe rows tolerate load <= 1.6, not the radar's 1.4: a
          // SHORT focused run cannot reach the calibrated probe floor
          // (JIT/scheduler warm takes minutes — the documented phantom),
          // and the paired old-vs-HEAD comparison is same-context on
          // both sides, so the shared inflation cancels out.
          case Some(p) if p.oldLoad <= 1.6 && p.headLoad <= 1.6 &&
              p.headMin >= p.oldMin * 1.3 =>
            regressionSuspected += n
            System.err.println(
              s"[bench] RESTAMP REFUSED for $n: HEAD (${p.headC}) reads " +
                s"${jnum("%.3f", p.headMin)} vs ${jnum("%.3f", p.oldMin)} " +
                s"on rebuilt ${p.commit} in the same focused context — " +
                "the slowdown arrived with the code (REGRESSION, not " +
                "host drift). Fix the regression; the baseline stands.")
            None
          case Some(p) if p.oldLoad <= 1.6 && p.headLoad <= 1.6 &&
              p.oldMin >= b * 1.35 =>
            val v = math.min(quietMin, p.headMin)
            Some(n -> (v,
              s"restamped ${java.time.LocalDate.now} after $k quiet rounds " +
                s">=1.5x old=${jnum("%.3f", b)} " +
                s"new=${jnum("%.3f", v)} load=${jnum("%.2f", quietLoad)} " +
                s"probe_base=${jnum("%.4f", probeBase)} head=$head " +
                s"drift_probe=${p.commit}@${jnum("%.3f", p.oldMin)} " +
                s"head_probe=${p.headC}@${jnum("%.3f", p.headMin)} " +
                "(old commit also slow = host drift)"))
          // Slow-creep guard: the old commit still attains the baseline
          // but HEAD focused does not (>=1.35x) even though the per-round
          // step stayed under the 1.3x paired trigger. Without this
          // branch each round's probe compares only against the PREVIOUS
          // snapshot, so a <1.3x-per-round regression keeps resetting the
          // counter forever; flag it instead of certifying it as context
          // inflation.
          case Some(p) if p.oldLoad <= 1.6 && p.headLoad <= 1.6 &&
              p.oldMin < b * 1.35 && p.headMin >= b * 1.35 =>
            regressionSuspected += n
            System.err.println(
              s"[bench] restamp for $n REFUSED (slow creep): rebuilt " +
                s"${p.commit} attains the baseline " +
                s"(${jnum("%.3f", p.oldMin)} vs ${jnum("%.3f", b)}) but " +
                s"HEAD focused reads ${jnum("%.3f", p.headMin)} >= 1.35x " +
                "— cumulative regression across rounds, not host drift.")
            None
          case Some(p) if p.oldLoad <= 1.6 && p.headLoad <= 1.6 =>
            probeResets += n
            System.err.println(
              s"[bench] restamp for $n CANCELLED: rebuilt ${p.commit} " +
                s"reads ${jnum("%.3f", p.oldMin)} and HEAD " +
                s"${jnum("%.3f", p.headMin)} focused — the baseline " +
                s"(${jnum("%.3f", b)}) is still attainable; the radar " +
                "figure was full-suite-context inflation. Counter reset.")
            None
          case other =>
            val why = other match {
              case Some(p) =>
                s"probe row (${p.commit}@${jnum("%.3f", p.oldMin)}) was " +
                  s"contended (loads ${jnum("%.2f", p.oldLoad)}/" +
                  jnum("%.2f", p.headLoad) + ")"
              case None => driftProbe.get(n) match {
                case Some(p) =>
                  s"probe row is for head_commit ${p.headC}, not current " +
                    s"HEAD $head (stale probe — re-run it)"
                case None => "no drift-probe row"
              }
            }
            System.err.println(
              s"[bench] restamp for $n DEFERRED: $why. Run: " +
                s"tools/drift_probe.sh $n   (rebuilds the prior round's " +
                "commit in a worktree, paired focused quiet passes, writes " +
                "bench_drift_probe.json), then re-run this bench.")
            None
        }
      }.toMap
    restamps.foreach { case (n, (v, why)) =>
      System.err.println(s"[bench] baseline restamp $n -> ${jnum("%.3f", v)} ($why)")
    }
    // self-heal the quiet baseline: any query this run measured quieter
    // than its recorded row (or never recorded) writes its new minimum —
    // the file converges on the quietest figure the host has ever shown,
    // so the 1.15x trigger tightens over rounds instead of drifting.
    // Confirmed-stale rows are then re-stamped UP (the one sanctioned
    // raise), and their counters retired.
    val healed = (quietBase ++ results.collect {
      case (n, (v, _)) if v < quietBase.getOrElse(n, Double.MaxValue) =>
        n -> v
    } ++ restamps.map { case (n, (v, _)) => n -> v }).toSeq.sortBy(_._1)
    val staleRows = (staleNext -- restamps.keys -- probeResets).toSeq.sorted
      .map { case (n, k) => s""" "__stale_$n": $k""" }
    val restampRows =
      (restampIn ++ restamps.map { case (n, (_, why)) =>
        s"__restamp_$n" -> why
      }).toSeq.sorted.map { case (k, v) => s""" "$k": "$v"""" }
    if (sfMatches)
      try java.nio.file.Files.write(quietPath,
        ((s""" "__sf": "${quietSf.getOrElse(sfDir)}"""" +:
          healed.map { case (n, v) => s""" "$n": ${jnum("%.3f", v)}""" }) ++
          staleRows ++ restampRows)
          .mkString("{\n", ",\n", "\n}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Exception =>
        System.err.println(s"[bench] quiet-baseline write failed: $e") }
    val total = results.map(_._2._1).sum
    val staleJson = staleObserved.collect {
      case (n, (_, _, true)) => "\"" + n + "\""
    }.mkString("[", ",", "]")
    val regJson = regressionSuspected.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val radarLine = s"""{"metric":"total","value":${jnum("%.3f", total)},"unit":"sec","queries":$qJson,"errors":$errJson,"unconverged":$uncJson,"load":$loadJson,"load_median":${jnum("%.2f", medianLoad)},"retries":$retries,"quiet_minima":$qmJson,"stale_baseline":$staleJson,"regression_suspected":$regJson,"probe_base_sec":${jnum("%.4f", probeBase)},"wall_sec":${jnum("%.1f", wallSec)},"sf":"$sfDir"}"""
    println(radarLine)
    // Persist the FULL radar line to a file the compact summary points
    // at: BENCH_r15.json's parsed.queries was truncated to the worst-5
    // because the driver's tail capture cannot hold the 119-entry line —
    // with the pointer contract the round artifact alone can always
    // answer "which queries regressed" (the driver commits this file as
    // BENCH_radar_rN.json; the path below travels inside BENCH_rN).
    val radarPath = sys.env.getOrElse("SPARK_GRAFT_RADAR_OUT",
      "bench_last_radar.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(radarPath),
      (radarLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] radar-file write failed: $e") }
    // Compact driver-facing summary as the LAST stdout line: the
    // 119-query radar JSON above outgrew the driver's tail capture in
    // r14 (BENCH_r14.json "parsed": null — the tail began mid-token), so
    // the line the tail is guaranteed to contain carries the totals, the
    // errors, and the 5 worst baseline ratios. "queries" holds only
    // those worst-5 figures ("queries_truncated": true says so); the
    // full per-query map is the preceding line.
    // worst-5 vs baseline; when no baseline row matches this fixture
    // (mult runs, the sf0.01 smoke) fall back to the 5 slowest by
    // seconds — and then OMIT worst_vs_baseline entirely rather than
    // padding it with placeholder 1.0 ratios a reader could mistake for
    // genuine at-baseline measurements.
    val vsBase = results.flatMap { case (n, (v, _)) =>
      quietBase.get(n).map(b => (n, v, v / b))
    }
    val worst =
      if (vsBase.nonEmpty) vsBase.sortBy(-_._3).take(5)
      else results.map { case (n, (v, _)) => (n, v, Double.NaN) }
        .sortBy(-_._2).take(5)
    val worstQ = worst
      .map { case (n, v, _) => "\"" + n + "\":" + jnum("%.3f", v) }
      .mkString("{", ",", "}")
    val worstRField =
      if (vsBase.isEmpty) ""
      else worst
        .map { case (n, _, r) => "\"" + n + "\":" + jnum("%.2f", r) }
        .mkString(""""worst_vs_baseline":{""", ",", "},")
    println(s"""{"metric":"total","value":${jnum("%.3f", total)},"unit":"sec","n_queries":${results.size},"queries":$worstQ,"queries_truncated":true,"radar_file":"$radarPath",$worstRField"errors":$errJson,"load_median":${jnum("%.2f", medianLoad)},"retries":$retries,"regression_suspected":$regJson,"probe_base_sec":${jnum("%.4f", probeBase)},"wall_sec":${jnum("%.1f", wallSec)},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
