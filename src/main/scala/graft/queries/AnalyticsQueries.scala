package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics operators beyond the reference's catalog that every
  * large-scale event pipeline needs: exact quantiles, approximate
  * distinct counts, and sessionization.
  */
object AnalyticsQueries {

  /** Per-hour cohort cap for the exact pairwise correlation: bounds the
    * quadratic users-per-hour blowup deterministically (smallest K user
    * ids per hour). 64 binds at sf0.1 (max 166 users/hour) and keeps the
    * worst hour's pair count ≤ K²/2 at any scale.
    */
  val MaxUsersPerHour = 64

  /** Session-conf key naming an explicit seed-user list (comma-separated
    * ids) for `q_series_correlation_seeded` — the production contract:
    * the target list arrives as configuration, not a code literal.
    */
  val SeedUsersConf = "spark.graft.correlation.seedUsers"

  /** Fixed-count cap on the FIXTURE default seed set (every 25th user id,
    * at most this many). A count, not a fraction: the broadcast seed side
    * stops growing once the user base passes 25×cap ids, so the "seed
    * side is tiny and broadcast" claim holds at any corpus size. The
    * production path supplies explicit ids via [[SeedUsersConf]].
    */
  val MaxDefaultSeeds = 32

  /** Seed-set series correlation, the linear-cost production path:
    * correlate every user's hourly series against the named seed users
    * only. The seed side is tiny and broadcast — the corpus side never
    * shuffles for the join. `seedIds = None` selects the fixture default
    * (every 25th user id, capped at [[MaxDefaultSeeds]] seeds).
    */
  def seriesCorrelationSeeded(events: org.apache.spark.sql.DataFrame,
      seedIds: Option[Seq[Long]]): org.apache.spark.sql.DataFrame = {
    def hourlyOf(ev: org.apache.spark.sql.DataFrame) = ev
      .groupBy(col("user_id"),
        (col("ts").cast("long") / 3600).cast("long").as("h"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
        .as("sv"))
    val hourly = hourlyOf(events)
    // The seed filter commutes with the per-(user, hour) aggregation, so
    // it is applied to the EVENTS SCAN, not to a second copy of the full
    // hourly aggregation: the old `hourly.where(seed)` subtree planned as
    // a complete second scan+aggregate of the corpus (runtime exchange
    // reuse measurably does not fire across these branches — the
    // q_importance_weights lesson), while the pushed filter reads only
    // the seed users' rows (parquet predicate pushdown) and aggregates a
    // |seeds|-sized stream. Same seed series, bit-identical sv values.
    val seeds = seedIds match {
      case Some(ids) => hourlyOf(events.where(col("user_id").isin(ids: _*)))
      case None => hourlyOf(events.where(col("user_id") % 25 === 0 &&
        col("user_id") < 25L * MaxDefaultSeeds))
    }
    val paired = broadcast(seeds).as("a").join(hourly.as("b"),
        col("a.h") === col("b.h") &&
          col("a.user_id") =!= col("b.user_id"))
      .select(col("a.user_id").as("seed_user"),
        col("b.user_id").as("user_b"),
        col("a.sv").as("sva"), col("b.sv").as("svb"))
    // pre-aggregate cut for the same ANSI corr single-row trap as the
    // exact path (data-dependent here, structural there); the window
    // shares the pair key with the groupBy so its exchange is reused
    val byPair = org.apache.spark.sql.expressions.Window
      .partitionBy("seed_user", "user_b")
    paired.withColumn("nh", count(lit(1)).over(byPair))
      .where(col("nh") >= 5)
      .groupBy("seed_user", "user_b")
      .agg(count(lit(1)).as("n_hours"),
        Det.r4(corr(col("sva"), col("svb"))).as("r"))
  }

  def defs: Map[String, QueryDef] = Map(
    // Exact quantiles per group (linear interpolation — both engines use
    // the same definition; elements rounded with the deterministic floor
    // form).
    "q_quantiles" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(percentile(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99))).as("qs"))
        .select(col("event_type"),
          Det.r4(col("qs").getItem(0)).as("p50"),
          Det.r4(col("qs").getItem(1)).as("p95"),
          Det.r4(col("qs").getItem(2)).as("p99")),
      Some("""SELECT event_type,
        floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS p50,
        floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000 AS p95,
        floor(quantile_cont(value, 0.99) * 10000 + 0.5) / 10000 AS p99
        FROM events GROUP BY event_type"""),
      bench = true),

    // Approximate distinct (HLL++): the sketch every 100 TB pipeline uses
    // instead of count(DISTINCT). Engines' sketches differ, so the raw
    // estimate isn't oracle-able — but the ERROR BOUND is: the compared
    // frame is (group, exact_users, n, within_bound) where Spark computes
    // both the sketch and the exact count and emits the bound verdict
    // (|approx−exact|/exact < 0.05, the AnalyticsSpec ε = 5× the rsd),
    // while DuckDB computes the same exact figures and asserts the
    // verdict constant-true. A sketch drifting out of bound flips the
    // BIGINT verdict column and the hash goes red — the check is exact
    // even though the sketch isn't.
    // Plan note: the sketch runs over the PRE-DEDUPED (event_type,
    // user_id) frame, not the raw events. HLL registers are a max over
    // hashed inputs, so duplicates never move the estimate — but Spark's
    // single-agg rewrite of {approx_count_distinct(u), count(DISTINCT u)}
    // keys the partial aggregate by (group, u) and allocates a partial
    // HLL PER USER (rsd 0.01 → ~21 KB of registers each): thousands of
    // corpus-keyed sketches built and shuffled to estimate sets of size
    // one. Aggregating counts first and sketching the distinct frame
    // keeps one sketch per (group × partition) — identical estimate,
    // measured 2.5 s → 1.0 s at sf0.1, and the sketch memory is
    // O(groups), not O(users), at any corpus size.
    "q_approx_distinct" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count(lit(1)).as("exact_users"),
          sum(col("c")).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx_users") - col("exact_users"))
            .cast("double") / col("exact_users") < 0.05)
            .cast("long").as("within_bound")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
        count(*) AS n, CAST(1 AS BIGINT) AS within_bound
        FROM events GROUP BY event_type""")),

    // Approximate quantiles (Greenwald-Khanna sketch) — completes the
    // sketch family next to HLL distinct and CMS heavy hitters: at
    // 100 TB the exact `percentile` holds per-group value multisets,
    // the GK sketch is constant-memory and mergeable (one partial-agg
    // pass, same plan shape as any sum). The estimates aren't
    // engine-portable, but the GK RANK guarantee is: the returned value
    // must have SOME rank within n/accuracy (+1 for the discrete
    // convention) of the target rank q*n. With ties that "some rank" is
    // an interval — a value duplicated d times occupies ranks
    // (count(<v), count(<=v)] — so the verdict checks that the interval
    // INTERSECTS the ±n/accuracy band, not that the max-rank count
    // lands inside it (max-rank alone fails spuriously once a tie block
    // wider than the slack straddles the target: ScaleFixture's 100×
    // replication makes every value ~100-fold and found exactly this).
    // Spark verifies its own estimates — the one-row-per-group estimate
    // frame broadcasts back onto events and conditional counts recover
    // each estimate's exact rank interval (one extra broadcast-join
    // pass, no second shuffle of the corpus) — and DuckDB asserts the
    // three verdicts constant-true over the same groups. Same shape as
    // AnalyticsSpec's in-JVM bound, now hash-checked cross-engine per
    // round.
    "q_approx_quantiles" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), col("value"))
        val est = ev.groupBy("event_type")
          .agg(percentile_approx(col("value"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("qs"),
            count(lit(1)).as("n"))
        // rank interval of estimate i: (lo_i = count(< est), hi_i =
        // count(<= est)]; ok iff that HALF-OPEN interval meets
        // q*n ± (n/1e4 + 1). The smallest rank the estimate occupies is
        // lo_i + 1 (lo_i itself is the count of strictly-smaller values,
        // not an occupied rank), so the left-edge test is on lo_i + 1 —
        // a bare lo_i would admit one rank beyond the stated bound.
        def okCol(lo: org.apache.spark.sql.Column,
            hi: org.apache.spark.sql.Column, q: Double) = {
          val slack = col("n") / lit(10000.0) + lit(1.0)
          (lo.cast("double") + lit(1.0) <= lit(q) * col("n") + slack &&
            hi.cast("double") >= lit(q) * col("n") - slack).cast("long")
        }
        def cnt(op: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
            => org.apache.spark.sql.Column, i: Int) =
          sum(when(op(col("value"), col("qs").getItem(i)), 1L)
            .otherwise(0L))
        ev.join(broadcast(est), "event_type")
          .groupBy(col("event_type"), col("n"))
          .agg(
            cnt(_ < _, 0).as("lo50"), cnt(_ <= _, 0).as("hi50"),
            cnt(_ < _, 1).as("lo95"), cnt(_ <= _, 1).as("hi95"),
            cnt(_ < _, 2).as("lo99"), cnt(_ <= _, 2).as("hi99"))
          .select(col("event_type"), col("n"),
            okCol(col("lo50"), col("hi50"), 0.5).as("ok_p50"),
            okCol(col("lo95"), col("hi95"), 0.95).as("ok_p95"),
            okCol(col("lo99"), col("hi99"), 0.99).as("ok_p99"))
      },
      Some("""SELECT event_type, count(*) AS n,
        CAST(1 AS BIGINT) AS ok_p50, CAST(1 AS BIGINT) AS ok_p95,
        CAST(1 AS BIGINT) AS ok_p99
        FROM events GROUP BY event_type""")),

    // Rollup (subtotals + grand total) — one of the grouping-set shapes
    // the reference lacks and Spark gives for free (SURVEY §2.2
    // exhaustiveness note). NULL group keys mark subtotal rows in both
    // engines.
    "q_rollup" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.r2(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")).as("revenue")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""")),

    // Cube (all grouping-set combinations) — completes the grouping-set
    // family next to q_rollup. One shuffle; Spark expands the grouping
    // sets map-side so each input row feeds its 4 combinations before
    // the exchange (partial agg still applies).
    "q_cube" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.r2(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")).as("revenue")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // Pivot: event-type columns per user. Conditional aggregation rather
    // than Dataset.pivot — the same result in ONE shuffle (pivot plans
    // groupBy(user, type) + re-agg = two exchanges).
    "q_pivot" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase")),
      Some("""SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click') AS n_click,
        count(*) FILTER (WHERE event_type = 'view') AS n_view,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        FROM events GROUP BY user_id""")),

    // Analytic window functions (lag): inter-event gap stats per user —
    // the ranking/analytic family the reference lacks.
    "q_event_gaps" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts")
        Tables.load(s, dir, "events")
          .withColumn("gap_s",
            col("ts").cast("long") -
              lag(col("ts"), 1).over(byUser).cast("long"))
          .where(col("gap_s").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            max(col("gap_s")).as("max_gap_s"),
            sum(col("gap_s")).as("sum_gap_s"))
      },
      Some("""SELECT user_id, count(*) AS n_gaps,
        max(gap_s) AS max_gap_s, CAST(sum(gap_s) AS BIGINT) AS sum_gap_s
        FROM (
          SELECT user_id,
            CAST(floor(epoch(ts)) AS BIGINT) -
            CAST(floor(epoch(lag(ts) OVER (
              PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gap_s
          FROM events) t
        WHERE gap_s IS NOT NULL
        GROUP BY user_id""")),

    // Per-user EWMA with alert counts — the sequential recurrence every
    // monitoring pipeline wants (ewma_i = 0.5*ewma_{i-1} + 0.5*x_i,
    // alert when x > 1.5*ewma_before). alpha = 0.5 and factor 1.5 are
    // exact binary doubles, so the whole fold is the identical IEEE-754
    // sequence in both engines — bit-exact without quantizing the
    // recurrence itself (only the reported final value rounds). A
    // recurrence is inherently ordered, so the scale contract is
    // per-KEY sequentiality: each user's series folds inside one
    // aggregate call after an ordered collect — state bounded by the
    // per-user event count, users parallel across executors. (An
    // unbounded single series wants the streaming plane, not a batch
    // collect.) The fold starts FROM THE FIRST ELEMENT (DuckDB's
    // list_reduce contract), mirrored in Spark by slicing the tail and
    // seeding the accumulator with vs[1].
    "q_ewma" -> QueryDef(
      (s, dir) => {
        val merge = (acc: org.apache.spark.sql.Column,
            x: org.apache.spark.sql.Column) =>
          struct(
            (lit(0.5) * acc.getField("ewma") + lit(0.5) * x).as("ewma"),
            (acc.getField("alerts") +
              when(x > lit(1.5) * acc.getField("ewma"), 1).otherwise(0))
              .as("alerts"))
        Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            transform(array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("value")))),
              e => e.getField("value")).as("vs"))
          .withColumn("st", aggregate(
            slice(col("vs"), lit(2), size(col("vs")) - 1),
            struct(element_at(col("vs"), 1).as("ewma"),
              lit(0).as("alerts")),
            merge))
          .select(col("user_id"), col("n_events"),
            Det.r4(col("st.ewma")).as("final_ewma"),
            col("st.alerts").cast("long").as("n_alerts"))
      },
      // Oracle note: DuckDB 1.0's list_reduce SILENTLY mis-accumulates
      // STRUCT accumulators (one field folds, the other freezes after
      // its first change — found by tracing prefix folds), so the
      // oracle uses scalar-accumulator folds only: the alert test
      // recomputes the prefix EWMA per position (O(n²) per user, fine
      // at oracle scale, bit-identical left fold).
      Some(s"""WITH s AS (SELECT user_id,
          list(value ORDER BY ts, event_id) AS vs,
          count(*) AS n_events
        FROM events GROUP BY 1)
        SELECT user_id, n_events,
          ${Det.sqlR4("list_reduce(vs, (a, x) -> 0.5 * a + 0.5 * x)")} AS final_ewma,
          CAST(len(list_filter(generate_series(2, len(vs)),
            i -> vs[i] > 1.5 * list_reduce(vs[1:i-1],
              (a, x) -> 0.5 * a + 0.5 * x))) AS BIGINT) AS n_alerts
        FROM s""")),

    // Time-series similarity search: Pearson correlation between users'
    // hourly activity series (aligned on hour buckets; per-hour sums made
    // exact via DECIMAL so both engines correlate identical series). The
    // self-join on the hour bucket is an equi-join — candidate pairs
    // share observed hours, never a full cross product of series. Pair
    // generation is quadratic in users-per-hour, so the join admits only
    // a DETERMINISTIC per-hour cohort: the MaxUsersPerHour smallest user
    // ids of each hour (row_number over the already-aggregated hourly
    // series — one small exchange, bounded output). That bounds the
    // worst hour at any scale the same way the shingle-DF cap bounds
    // q_ngram_jaccard; the unbounded-corpus path is
    // q_series_correlation_seeded (broadcast seeds, linear). SCALE.md
    // documents the cutover.
    "q_series_correlation" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.load(s, dir, "events")
          .groupBy(col("user_id"),
            (col("ts").cast("long") / 3600).cast("long").as("h"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sv"))
        val capped = hourly.withColumn("rk",
            row_number().over(Window.partitionBy("h").orderBy("user_id")))
          .where(col("rk") <= MaxUsersPerHour).drop("rk")
        val paired = capped.as("a").join(capped.as("b"),
            col("a.h") === col("b.h") &&
              col("a.user_id") < col("b.user_id"))
          .select(col("a.user_id").as("user_a"),
            col("b.user_id").as("user_b"),
            col("a.sv").as("sva"), col("b.sv").as("svb"))
        // The min-shared-hours cut must happen BEFORE the aggregate:
        // ANSI-mode corr THROWS (div/0) on single-row groups instead of
        // returning NULL, and the per-hour cap structurally creates
        // pairs that co-occur exactly once. The window count shares the
        // pair key with the groupBy, so the exchange is reused — one
        // shuffle total, same rows as the HAVING-style oracle filter.
        val byPair = Window.partitionBy("user_a", "user_b")
        paired.withColumn("nh", count(lit(1)).over(byPair))
          .where(col("nh") >= 5)
          .groupBy("user_a", "user_b")
          .agg(count(lit(1)).as("n_hours"),
            Det.r4(corr(col("sva"), col("svb"))).as("r"))
      },
      Some(s"""WITH hourly AS (
          SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS h,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
          FROM events GROUP BY 1, 2),
        capped AS (
          SELECT user_id, h, sv FROM (
            SELECT user_id, h, sv,
              row_number() OVER (PARTITION BY h ORDER BY user_id) AS rk
            FROM hourly) t
          WHERE rk <= $MaxUsersPerHour)
        SELECT a.user_id AS user_a, b.user_id AS user_b,
          count(*) AS n_hours,
          floor(corr(a.sv, b.sv) * 10000 + 0.5) / 10000 AS r
        FROM capped a JOIN capped b
          ON a.h = b.h AND a.user_id < b.user_id
        GROUP BY 1, 2 HAVING count(*) >= 5""")),
      // not a bench headliner (round 7): the capped exploratory form's
      // scale story is its K²/2-per-hour bound, already told above; the
      // documented scale path — and the benched one — is the seeded form.

    // The 100x path for series correlation: correlate every user against
    // a SEED set only. Cost is linear in corpus x |seeds| instead of
    // quadratic in users-per-hour: the seed side's hourly series is
    // tiny and BROADCAST, so the big side never shuffles at all — no
    // hour-bucket skew, no pairwise blowup. Same plan shape downstream
    // (corr moments partial-agg). SCALE.md documents the cutover.
    // The seed set is a PARAMETER (seriesCorrelationSeeded); the query
    // reads an explicit list from the session conf key `SeedUsersConf`
    // when set, else falls back to the fixture default (every 25th id,
    // capped at MaxDefaultSeeds — a fixed COUNT, so the broadcast stays
    // tiny at any user-base size; the DuckDB oracle mirrors the cap).
    "q_series_correlation_seeded" -> QueryDef(
      (s, dir) => {
        val confSeeds = s.conf.getOption(SeedUsersConf)
          .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
            .map(_.toLong))
        seriesCorrelationSeeded(Tables.load(s, dir, "events"), confSeeds)
      },
      Some(s"""WITH hourly AS (
          SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS h,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
          FROM events GROUP BY 1, 2)
        SELECT a.user_id AS seed_user, b.user_id AS user_b,
          count(*) AS n_hours,
          floor(corr(a.sv, b.sv) * 10000 + 0.5) / 10000 AS r
        FROM hourly a JOIN hourly b
          ON a.h = b.h AND a.user_id <> b.user_id
        WHERE a.user_id % 25 = 0 AND a.user_id < ${25L * MaxDefaultSeeds}
        GROUP BY 1, 2 HAVING count(*) >= 5"""),
      bench = true),

    // Windowed trending top-k: the most active users per hour window —
    // the "trending now" analytics shape. Rank-limit pushdown
    // (WindowGroupLimit) computes a per-partition partial top-k BEFORE
    // the exchange, so each hour's full user list never shuffles; hours
    // partition the rank windows, so no global sort exists at any scale.
    "q_window_topk" -> QueryDef(
      (s, dir) => {
        val byWin = Window.partitionBy("ws")
          .orderBy(col("n").desc, col("user_id"))
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "3600 seconds"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").cast("long").as("ws"),
            col("user_id"), col("n"))
          .withColumn("rk", row_number().over(byWin).cast("long"))
          .where(col("rk") <= 5)
      },
      Some("""SELECT ws, user_id, n, rk FROM (
          SELECT ws, user_id, n,
            CAST(row_number() OVER (
              PARTITION BY ws ORDER BY n DESC, user_id) AS BIGINT) AS rk
          FROM (SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
              user_id, count(*) AS n
            FROM events GROUP BY 1, 2) t) r
        WHERE rk <= 5""")),

    // Sessionization: maximal event chains per user with gaps < 30 min —
    // gaps-and-islands on both engines (identical semantics to Spark's
    // session_window for point events; the streaming form lives in
    // TemporalOps.sessionAgg). One shuffle on user_id.
    "q_sessions" -> QueryDef(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts")
        Tables.load(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_session",
            (col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800)
              .cast("int"))
          .withColumn("session_idx",
            sum(col("new_session")).over(byUser))
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).cast("long").as("session_start"),
            (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
              .as("duration_s"))
      },
      Some("""WITH marked AS (
          SELECT user_id, ts,
            CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              OR CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
          FROM events),
        sessions AS (
          SELECT user_id, ts,
            sum(new_session) OVER (
              PARTITION BY user_id ORDER BY ts
              ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM marked)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          count(*) AS n_events,
          CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
          CAST(floor(epoch(max(ts))) AS BIGINT)
            - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sessions GROUP BY user_id, session_idx"""),
      bench = true))
}
