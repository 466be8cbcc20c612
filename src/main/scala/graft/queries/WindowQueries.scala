package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Windows

/** Window ("selection policy") queries — the reference's temporal and
  * counting windows (reference: pkg/events/selection_policy.go:122-137)
  * exercised over the `events` table and checked against DuckDB.
  *
  * Window starts are emitted as BIGINT epoch seconds (`ws`) on both sides
  * so the comparison never depends on timestamp-type hashing. Spark's
  * `window()` aligns buckets to the epoch origin, which is exactly
  * `floor(epoch(ts)/len)*len` — the DuckDB expression used in the oracles.
  *
  * Scale: `groupBy(window(...))` is a plain hash aggregate — partial
  * aggregation map-side, one shuffle of per-window partials, never of raw
  * rows. Sliding windows multiply rows by (length/slide) before the
  * partial agg, which is the standard cost everywhere. GLOBAL counting
  * windows need a total order — inherently sequential; they exist for
  * reference parity (the reference is single-node, so its counting window
  * is global by construction). The scale path is the per-key variant
  * (`Windows.countingWindowIds` with a partitionBy) or the streaming
  * stateful form in graft.streaming.
  */
object WindowQueries {

  /** Decimal-exact, order-independent sum of a double column. */
  private def dsum(c: String) =
    Det.r2(sum(col(c).cast("decimal(18,2)")).cast("double"))

  private val oracleSum =
    "floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100"

  def defs: Map[String, QueryDef] = Map(
    // BatchSum over a tumbling temporal window (reference: BatchSum
    // default_operators.go:18-38 + TemporalWindowPolicy).
    "q_window_sum" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "300 seconds"))
        .agg(dsum("value").as("sum_value"), count(lit(1)).as("n_events"))
        .select(col("window.start").cast("long").as("ws"),
          col("sum_value"), col("n_events")),
      Some(s"""SELECT CAST(floor(epoch(ts)/300)*300 AS BIGINT) AS ws,
        $oracleSum AS sum_value, count(*) AS n_events
        FROM events GROUP BY 1"""),
      bench = true),

    // BatchCount per hour per event_type — the reference's
    // WordCountWindow shape (examples/processing/customOperator/main.go:17-42):
    // count per (window, token).
    "q_window_wordcount" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "3600 seconds"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("ws"),
          col("event_type"), col("n")),
      Some("""SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS ws,
        event_type, count(*) AS n
        FROM events GROUP BY 1, 2""")),

    // Sliding temporal window (length 600s, slide 300s) — each event lands
    // in length/slide = 2 windows (reference: TemporalWindowPolicy with
    // shift < length, selection_policy_test.go sliding cases).
    "q_window_sliding" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "600 seconds", "300 seconds"))
        .agg(dsum("value").as("sum_value"), count(lit(1)).as("n_events"))
        .select(col("window.start").cast("long").as("ws"),
          col("sum_value"), col("n_events")),
      Some(s"""SELECT ws, $oracleSum AS sum_value, count(*) AS n_events
        FROM (SELECT value,
          unnest(generate_series(
            CAST(floor((epoch(ts)-600)/300) AS BIGINT) + 1,
            CAST(floor(epoch(ts)/300) AS BIGINT))) * 300 AS ws
          FROM events) t
        GROUP BY ws"""),
      bench = true),

    // Event-time lineage (reference: NewEventFromOthers,
    // pkg/events/timestamper.go:22-50): a derived event's stamp spans
    // min(start)/max(end) of its inputs — here per user.
    "q_stamp_lineage" -> QueryDef(
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min(col("ts")).cast("long").as("stamp_start"),
          max(col("ts")).cast("long").as("stamp_end"),
          count(lit(1)).as("n_inputs")),
      Some("""SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS stamp_start,
        CAST(floor(epoch(max(ts))) AS BIGINT) AS stamp_end, count(*) AS n_inputs
        FROM events GROUP BY user_id""")),

    // Counting windows (reference: CountingWindowPolicy,
    // selection_policy.go:122-128, 140-176). Tumbling: n = shift = 100.
    "q_counting_tumbling" -> QueryDef(
      (s, dir) => Windows.countingWindowAgg(
        Seq(col("event_id")), 100, 100)(
        Seq(dsum("value").as("sum_value"), count(lit(1)).as("n_events")))(
        Tables.load(s, dir, "events").select("event_id", "value")),
      Some(countingOracle(100, 100))),

    // Overlapping counting window: shift < n re-delivers events
    // (selection_policy_test.go:81-95).
    "q_counting_sliding" -> QueryDef(
      (s, dir) => Windows.countingWindowAgg(
        Seq(col("event_id")), 100, 50)(
        Seq(dsum("value").as("sum_value"), count(lit(1)).as("n_events")))(
        Tables.load(s, dir, "events").select("event_id", "value")),
      Some(countingOracle(100, 50))),

    // Skipping counting window: shift > n drops gap events
    // (selection_policy_test.go:67-80).
    "q_counting_skipping" -> QueryDef(
      (s, dir) => Windows.countingWindowAgg(
        Seq(col("event_id")), 50, 100)(
        Seq(dsum("value").as("sum_value"), count(lit(1)).as("n_events")))(
        Tables.load(s, dir, "events").select("event_id", "value")),
      Some(countingOracle(50, 100))),

    // KEYED counting windows — the horizontally scalable variant: an
    // independent counting window per user, partitioned across executors
    // (one shuffle on user_id; no global total order anywhere).
    "q_counting_bykey" -> QueryDef(
      (s, dir) => Windows.countingWindowAgg(
        Seq(col("event_id")), 20, 20, partitionBy = Seq(col("user_id")))(
        Seq(dsum("value").as("sum_value"), count(lit(1)).as("n_events")))(
        Tables.load(s, dir, "events").select("user_id", "event_id", "value")),
      Some(s"""WITH numbered AS (
        SELECT user_id, value,
          row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rn,
          count(*) OVER (PARTITION BY user_id) AS total
        FROM events)
      SELECT user_id, window_id, $oracleSum AS sum_value,
        count(*) AS n_events
      FROM (
        SELECT user_id, value, total,
          unnest(generate_series(
            CAST(greatest(ceil(CAST(rn - 20 + 1 AS DOUBLE) / 20), 0) AS BIGINT),
            CAST(floor(CAST(rn AS DOUBLE) / 20) AS BIGINT))) AS window_id
        FROM numbered) t
      WHERE window_id * 20 + 20 <= total
      GROUP BY user_id, window_id"""),
      bench = true))

  /** DuckDB oracle for counting windows: same row->window assignment
    * (row r in window w iff w*shift <= r < w*shift + n) and the same
    * completeness rule (window fires iff w*shift + n <= total rows —
    * CountingWindowPolicy.NextSelectionReady, selection_policy.go:144-146).
    */
  private def countingOracle(n: Int, shift: Int): String =
    s"""WITH numbered AS (
      SELECT value, row_number() OVER (ORDER BY event_id) - 1 AS rn,
        count(*) OVER () AS total
      FROM events)
    SELECT window_id, $oracleSum AS sum_value, count(*) AS n_events
    FROM (
      SELECT value, total,
        unnest(generate_series(
          CAST(greatest(ceil(CAST(rn - $n + 1 AS DOUBLE) / $shift), 0) AS BIGINT),
          CAST(floor(CAST(rn AS DOUBLE) / $shift) AS BIGINT))) AS window_id
      FROM numbered) t
    WHERE window_id * $shift + $n <= total
    GROUP BY window_id"""
}
