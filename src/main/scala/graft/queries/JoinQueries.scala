package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Windowed stream-join queries (reference: Join default_operators.go:117-163,
  * LeftJoin :166-218, heterogeneous blueprint operator_repository.go:146-168)
  * plus the fan-in merge (FanInOperatorEngine, operator_engine.go:164-292).
  *
  * The reference joins two map-event streams per temporal window on an
  * equality key, emitting every matching pair. Here the two "streams" are
  * the click and view slices of `events`, the window is a tumbling 600 s
  * bucket, and the key is user_id.
  *
  * Scale: the bucket is part of the join key, so this plans as a single
  * co-partitioned shuffled join on (user_id, bucket) — state never exceeds
  * one window per key, and AQE's skew-join splitting applies if one user
  * dominates. No custom operator, no broadcast needed on the big-big path.
  */
object JoinQueries {

  private def slice(s: org.apache.spark.sql.SparkSession, dir: String,
      tpe: String, prefix: String) =
    Tables.load(s, dir, "events")
      .where(col("event_type") === tpe)
      .select(col("user_id"), col("ts"),
        col("event_id").as(s"${prefix}_id"),
        col("value").as(s"${prefix}_value"))

  def defs: Map[String, QueryDef] = Map(
    // Windowed inner equi-join: every (click, view) pair for the same user
    // in the same 600 s window (reference Join semantics: all pairs per
    // matching key per window, default_operators.go:139-152).
    "q_join_windowed" -> QueryDef(
      (s, dir) => Joins.windowedJoin(
        slice(s, dir, "click", "click"),
        slice(s, dir, "view", "view"),
        "user_id", "ts", "600 seconds")
        .select(col("window_start").cast("long").as("ws"), col("user_id"),
          col("click_id"), col("click_value"),
          col("view_id"), col("view_value")),
      Some("""SELECT CAST(floor(epoch(c.ts)/600)*600 AS BIGINT) AS ws,
        c.user_id AS user_id,
        c.event_id AS click_id, c.value AS click_value,
        v.event_id AS view_id, v.value AS view_value
        FROM events c JOIN events v
          ON c.user_id = v.user_id
         AND floor(epoch(c.ts)/600) = floor(epoch(v.ts)/600)
        WHERE c.event_type = 'click' AND v.event_type = 'view'"""),
      bench = true),

    // Windowed left-outer join: unmatched clicks pass through with NULL
    // view columns (reference LeftJoin: unmatched left events pass through
    // unmerged, default_operators.go:186-207).
    "q_join_left" -> QueryDef(
      (s, dir) => Joins.windowedLeftJoin(
        slice(s, dir, "click", "click"),
        slice(s, dir, "view", "view"),
        "user_id", "ts", "600 seconds")
        .select(col("window_start").cast("long").as("ws"), col("user_id"),
          col("click_id"), col("click_value"),
          col("view_id"), col("view_value")),
      Some("""SELECT CAST(floor(epoch(c.ts)/600)*600 AS BIGINT) AS ws,
        c.user_id AS user_id,
        c.event_id AS click_id, c.value AS click_value,
        v.event_id AS view_id, v.value AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id
         AND floor(epoch(c.ts)/600) = floor(epoch(v.ts)/600)""")),

    // Right-overwrites-left merge semantics pinned with an oracle: both
    // sides carry a same-named `value` column; the joined output must
    // carry the RIGHT side's value (reference: maps.Copy order,
    // default_operators.go:144-147).
    "q_join_map_merge" -> QueryDef(
      (s, dir) => {
        def side(tpe: String) = Tables.load(s, dir, "events")
          .where(col("event_type") === tpe)
          .select(col("user_id"), col("ts"), col("value"))
        Joins.windowedJoin(side("click"), side("view"),
          "user_id", "ts", "600 seconds")
          .groupBy(col("window_start").cast("long").as("ws"), col("user_id"))
          .agg(Det.r2(sum(col("value").cast("decimal(18,2)")).cast("double"))
            .as("sum_merged_value"), count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT CAST(floor(epoch(c.ts)/600)*600 AS BIGINT) AS ws,
        c.user_id AS user_id,
        floor(CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100
          AS sum_merged_value,
        count(*) AS n_pairs
        FROM events c JOIN events v
          ON c.user_id = v.user_id
         AND floor(epoch(c.ts)/600) = floor(epoch(v.ts)/600)
        WHERE c.event_type = 'click' AND v.event_type = 'view'
        GROUP BY 1, 2""")),

    // Fan-in: N homogeneous streams merged into one windowed aggregate
    // (reference: FanInOperatorEngine + builder fan-in,
    // query_builder.go:183-189). Union is shuffle-free; the only shuffle
    // is the window aggregation itself.
    "q_fanin_union" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.where(col("event_type") === "click")
        val errors = ev.where(col("event_type") === "error")
        clicks.unionByName(errors)
          .groupBy(window(col("ts"), "3600 seconds"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").cast("long").as("ws"),
            col("event_type"), col("n"))
      },
      Some("""SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
        event_type, count(*) AS n
        FROM events WHERE event_type IN ('click', 'error')
        GROUP BY 1, 2""")),

    // As-of (point-in-time) join: each click enriched with the user's
    // most recent purchase at-or-before the click — the feature-pipeline
    // enrichment join. Spark side is the union+running-last form (ONE
    // key shuffle, no join operator — Joins.asofJoin); the oracle is
    // DuckDB's native ASOF LEFT JOIN, an independent implementation of
    // the same semantics. Timestamps compare at microseconds on both
    // engines (Spark timestamps are µs; the oracle truncates ns -> µs).
    "q_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts"), col("value").as("click_value"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("value"))
        graft.operators.Joins.asofJoin(
            clicks, purchases, "user_id", "ts", "pts",
            carry = Seq("value", "pts"))
          .select(col("click_id"), col("user_id"),
            col("ts").cast("long").as("click_s"),
            col("click_value"),
            col("asof_value").as("last_purchase_value"),
            col("asof_pts").cast("long").as("purchase_s"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us,
            value FROM events WHERE event_type = 'click'),
          p AS (SELECT user_id, epoch_ns(ts)//1000 AS us, value
            FROM events WHERE event_type = 'purchase')
        SELECT c.event_id AS click_id, c.user_id AS user_id,
          c.us // 1000000 AS click_s, c.value AS click_value,
          p.value AS last_purchase_value, p.us // 1000000 AS purchase_s
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.us >= p.us"""),
      bench = true),

    // Keyed time-range join: per error event, the same user's clicks in
    // the preceding hour — bucket-then-verify (Joins.timeRangeJoin), so
    // the range predicate is a residual on a co-partitioned equi-join,
    // never a theta join. The oracle is DuckDB's BETWEEN theta join.
    "q_range_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val errors = ev.where(col("event_type") === "error")
          .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"), col("value"))
        graft.operators.Joins.timeRangeJoin(
            errors, clicks, "user_id", "ts", "cts", 3600L)
          .groupBy("error_id", "user_id")
          .agg(count(lit(1)).as("n_clicks"),
            Det.r2(sum(col("value").cast("decimal(18,2)")).cast("double"))
              .as("sum_click_value"))
      },
      Some("""SELECT e.event_id AS error_id, e.user_id AS user_id,
          count(*) AS n_clicks,
          floor(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100
            AS sum_click_value
        FROM (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us
            FROM events WHERE event_type = 'error') e
        JOIN (SELECT user_id, epoch_ns(ts)//1000 AS us, value
            FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND c.us BETWEEN e.us - 3600000000 AND e.us
        GROUP BY 1, 2"""),
      bench = true))
}
