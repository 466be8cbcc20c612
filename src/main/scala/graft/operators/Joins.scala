package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed join operators (reference: pkg/processing/default_operators.go
  * Join :117-163, LeftJoin :166-218; engine operator_engine.go:294-448).
  *
  * Reference semantics: two streams of map-events are joined per temporal
  * window on an equality key; output is the merged map with the RIGHT side
  * overwriting the left on key collision (maps.Copy order, reference:
  * default_operators.go:144-147); all matching pairs per window (cartesian
  * per key).
  *
  * Spark mapping: equi-join on (key, window-bucket). The window bucket is
  * part of the join key, so Catalyst plans a plain shuffled hash /
  * sort-merge join co-partitioned on (key, bucket) — no custom operator
  * needed, and skew/AQE handling comes for free. Small sides should be
  * wrapped in `broadcast()` by the caller.
  */
object Joins {

  /** Assign the tumbling event-time bucket used as join-window key. */
  def bucket(ts: Column, length: String): Column = window(ts, length)

  /** Windowed inner equi-join. `leftCols`/`rightCols` select the payload;
    * on name collision the right side wins (reference right-overwrites-left
    * merge). Returns one row per matching (left, right) pair per window.
    */
  def windowedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      length: String): DataFrame = {
    val l = left.withColumn("_w", bucket(col(ts), length))
    val r = right.withColumn("_w", bucket(col(ts), length))
    mergeRightWins(l, r, Seq(key, "_w"), "inner")
  }

  /** Windowed left-outer join: unmatched left rows pass through with NULL
    * right columns (reference LeftJoin: unmatched/keyless left events pass
    * through unmerged, default_operators.go:186-207).
    */
  def windowedLeftJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      length: String): DataFrame = {
    val l = left.withColumn("_w", bucket(col(ts), length))
    val r = right.withColumn("_w", bucket(col(ts), length))
    mergeRightWins(l, r, Seq(key, "_w"), "left_outer")
  }

  /** Salted equi-join for skewed keys WITHOUT relying on AQE: the build
    * side is replicated `buckets` times (one copy per salt value), the
    * probe side gets a deterministic per-row salt derived from a
    * row-discriminating column, and the join key becomes (key, salt) —
    * splitting one hot key's row group across `buckets` tasks. Results
    * are identical to the unsalted join (each probe row still meets every
    * matching build row exactly once).
    *
    * Use when one key holds >> 1/numPartitions of the rows and the build
    * side is too big to broadcast; AQE's skew-join handles the sort-merge
    * case automatically, but salting also covers aggregations-after-join
    * and deterministic tests.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int,
      how: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(buckets)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "_salt"), how).drop("_salt")
  }

  /** As-of (point-in-time) join: attach to every left row the LATEST
    * right row with right ts <= left ts for the same key — the
    * enrichment join every feature/training pipeline needs (price as of
    * trade time, profile as of event time). Rows with no prior right row
    * get NULLs (left-outer asof).
    *
    * Spark-first shape: NOT a range join. Both sides are union-tagged
    * and sorted once per key partition; a running `last(_, ignoreNulls)`
    * over (ts, side) carries the most recent right payload forward into
    * each left row. ONE shuffle on the key, no join operator at all, no
    * candidate blowup — cost O(n log n) per key partition at any scale,
    * the same plan a 1000-executor cluster wants (PlanSpec pins the
    * no-join shape). The carried columns ride in a single struct so they
    * always come from the SAME right row, never mixed across rows.
    *
    * Contracts: equal (key, ts) on both sides means the right row IS
    * visible to the left row (ties sort right-before-left — the usual
    * inclusive asof, DuckDB/pandas semantics); multiple right rows on
    * one (key, ts) should be pre-deduplicated by the caller (the window
    * tie-break between them is not defined); NULL keys group together
    * here whereas SQL equality would drop them — filter them if SQL
    * parity on NULL keys matters.
    *
    * `carry` columns are emitted as `asof_<name>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "asofJoin needs at least one carried column")
    val leftSide = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_asof", lit(null).cast(
        org.apache.spark.sql.types.StructType(carry.map(c =>
          org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType, nullable = true)))))
    val rightSide = right
      .select(col(key), col(rightTs).as("_ats"), lit(0).as("_side"),
        struct(carry.map(col): _*).as("_asof"))
    // align schemas: right rows carry NULL left payload
    val rightAligned = leftSide.columns.foldLeft(rightSide) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(leftSide.schema(c).dataType))
    }.select(leftSide.columns.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col("_ats"), col("_side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    leftSide.unionByName(rightAligned)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(col) ++
        carry.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  /** Keyed time-range join: all (left, right) pairs with the same key
    * and right ts in [left ts - lookback, left ts] — the "what happened
    * in the preceding N seconds" join.
    *
    * Scale shape: never a theta join. Time is bucketed at the lookback
    * width; each left row probes its own and the previous bucket (a
    * range spanning w seconds overlaps at most 2 w-wide buckets), the
    * right side keeps its single home bucket, and the range predicate
    * becomes a RESIDUAL filter on a co-partitioned equi-join on
    * (key, bucket). Replication factor is exactly 2 on the probe side;
    * candidates are bounded by per-(key, bucket) density, not corpus² —
    * the same bucket-then-verify move as the LSH band joins.
    */
  def timeRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, "lookback must be positive")
    val w = lookbackSec * 1000000L
    // integer `div`, not floor(double /): µs-scale longs divided as
    // doubles can land within one ulp of a bucket boundary
    val l = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bucket",
        explode(array(expr(s"_lus div $w") - 1, expr(s"_lus div $w"))))
    val r = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bucket", expr(s"_rus div $w"))
    l.join(r, Seq(key, "_bucket"))
      .where(col("_rus") >= col("_lus") - w && col("_rus") <= col("_lus"))
      .drop("_bucket", "_lus", "_rus")
  }

  /** Join and emit left.* plus right.* where right-side columns replace
    * same-named left columns (but NULL right values — from outer joins —
    * fall back to the left value, matching map-merge semantics where an
    * absent right event leaves the left map unchanged).
    */
  private def mergeRightWins(
      l: DataFrame,
      r: DataFrame,
      keys: Seq[String],
      how: String): DataFrame = {
    val joined = l.alias("l").join(r.alias("r"), keys, how)
    val lOnly = l.columns.filterNot(c => keys.contains(c) || r.columns.contains(c))
    val rOnly = r.columns.filterNot(c => keys.contains(c) || l.columns.contains(c))
    val shared = l.columns.filter(c => r.columns.contains(c) && !keys.contains(c))
    val cols =
      keys.filterNot(_ == "_w").map(col) ++
        lOnly.map(c => col(s"l.$c")) ++
        shared.map(c => coalesce(col(s"r.$c"), col(s"l.$c")).as(c)) ++
        rOnly.map(c => col(s"r.$c"))
    joined.select(col("_w.start").as("window_start") +: cols: _*)
  }
}
