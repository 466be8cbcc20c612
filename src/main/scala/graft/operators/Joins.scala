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
