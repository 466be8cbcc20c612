package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions
import graft.operators.{Ann, Joins}

/** Skew torture: the guards and repairs exist since round 11/12 — this
  * spec proves them UNDER GENUINE SKEW at sizes where the unrepaired
  * plan would be a visible quadratic, not a 40-row toy.
  *
  *  - a planted ~4k dense cluster (ScaleFixture.plantHotCluster — the
  *    same generator the SCALE.md mult=10 skew measurements use) trips
  *    nearDupPairs' hot-bucket guard BY NAME, leak-free;
  *  - a planted 20k single-cell population is absorbed by semDedup's
  *    sub-k-means split with every refined cell at or under the cap —
  *    the pair-mining join runs ~sum c_i²/2 ≤ cells·cap²/2 exact
  *    cosines instead of the unsplit 2·10⁸;
  *  - Joins.saltedJoin measurably beats the unsalted shuffle join on a
  *    95%-hot key at 4M rows. (AQE's skew-join split is the first-line
  *    repair on a real cluster, but it only fires above its 256 MB
  *    partition threshold and only where an exchange exists to
  *    re-split — a hot partition below threshold, or a bucketed
  *    co-located join, still lands on one task; salting is the repair
  *    that works at ANY granularity.)
  */
class SkewTortureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-${System.nanoTime()}"), 8).getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  /** Deterministic background vectors, spread (unlike the hot cluster):
    * every component uniform-ish in [-1, 1) from xxhash64 of the flat
    * index — bucket populations stay near N/2^bits.
    */
  private def background(n: Long, dim: Int, idBase: Long = 0L) =
    spark.range(n).select(
      (col("id") + idBase).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col("id") * dim + j + 7L), lit(2000))
          .cast("double") / 1000 - 1).cast("float")).as("embedding"))

  test("planted dense cluster trips the nearDupPairs hot-bucket guard " +
      "by name, leak-free") {
    // 4k near-identical vectors among 8k spread ones: every band hashes
    // the cluster into one bucket (a hyperplane sign flip needs
    // |noise·h·u| > 1, ~1e-5 per bit at noise 0.1), so the worst bucket
    // holds ~4k >> maxBucket=512 while the background's worst bucket
    // stays ~8k/2^8 ≈ 31.
    val emb = ScaleFixture.plantHotCluster(spark, dim = 64, n = 4000)
      .select("vec_id", "embedding")
      .unionByName(background(8000, 64))
    val before = spark.sparkContext.getPersistentRDDs.size
    val e = intercept[IllegalStateException] {
      Ann.nearDupPairs(emb, dim = 64, threshold = 0.95, maxBucket = 512)
        .collect()
    }
    val named = "band=(\\d+) h=(-?\\d+) \\((\\d+)\\)".r
      .findFirstMatchIn(e.getMessage)
    assert(named.nonEmpty,
      s"guard did not name the hot bucket: ${e.getMessage}")
    val worstN = named.get.group(3).toLong
    assert(worstN > 3500,
      s"named worst bucket holds $worstN — the planted 4k cluster " +
        "did not land in one bucket (cluster noise too hot for the " +
        "hyperplanes?)")
    val deadline = System.nanoTime() + 15e9.toLong
    while (spark.sparkContext.getPersistentRDDs.size > before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "guard trip leaked the banded cache")
  }

  test("semDedup absorbs a planted 20k hot cell: every refined cell " +
      "at or under the cap, dup members dropped, no quadratic") {
    val n = 20000L
    val dim = 16
    val emb = ScaleFixture.plantHotCluster(spark, dim = dim, n = n,
      idBase = 0L)
      .select("vec_id", "embedding")
    // e0..e3 unit centroids: every planted vector (e0 + noise) assigns
    // to cell 0 — one cell holding the entire corpus, the worst case
    // the sub-split exists for.
    val cents = (0 until 4).map(c =>
      (c.toLong, Seq.tabulate(dim)(j => if (j == c) 1.0f else 0.0f)))
      .toDF("cell_id", "cell_emb")
    val cap = 1024L
    val t0 = System.nanoTime()
    val out = Ann.semDedup(emb, cents, thresholdQ = 9500L,
      maxCellSize = cap)
      .as[(Long, Long, Long)].collect()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"semDedup 20k-in-one-cell, cap=$cap: $sec%.1f s")
    assert(out.length == n, s"lost rows: ${out.length} of $n")
    assert(out.forall(_._2 == 0L), "cell_id must stay the ORIGINAL cell")
    // cluster members sit at pairwise cosine ~0.98-0.999 >= 0.95:
    // within every refined sub-cell all but the keeper are dropped, so
    // survivors ~ number of sub-cells (n/cap-ish), far under 1%
    val kept = out.count(_._3 == 0L)
    assert(kept >= 1 && kept <= 200,
      s"$kept keepers of $n dense near-dups — mining missed sub-cells?")
    // and the repair's load-bearing invariant, directly: every refined
    // pair_key population is at or under the cap, so pair mining costs
    // sum c_i^2/2 <= (n/cap)*cap^2/2 exact cosines, 20x under the
    // unsplit n^2/2
    val assigned = emb.withColumn("cell_id", lit(0L))
      .withColumn("aff", lit(0.5))
    val (reps, _, _) = Ann.refineCells(assigned, 9500L, cap)
    val worst = reps.groupBy("pair_key").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(worst <= cap, s"refined cell still holds $worst > $cap")
  }

  test("saltedJoin beats the unsalted shuffle join on a 95%-hot key " +
      "(4M rows, measured)") {
    val threshold0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle join: a broadcast build side has no skew to
    // repair (and IS the right plan when the build side fits — salting
    // is for when it doesn't)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = spark.range(4000000L).select(
        when(pmod(col("id"), lit(20)) < 19, 1L)
          .otherwise(pmod(col("id"), lit(64)) + 1).as("k"),
        col("id").as("pv"))
      val build = spark.range(65L).select((col("id") + 1).as("k"),
        (col("id") * 7).as("bv"))
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), sum(col("pv") + col("bv"))).head()
        (r.getLong(0), r.getLong(1))
      }
      def timed(f: => (Long, Long)): (Double, (Long, Long)) = {
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      def plain = checksum(probe.join(build, "k"))
      def salted = checksum(
        Joins.saltedJoin(probe, build, "k", col("pv"), buckets = 8))
      // warm both plans once (codegen + JIT), then min-of-2 timed
      plain; salted
      val (pt, pr) = Seq.fill(2)(timed(plain)).minBy(_._1)
      val (st, sr) = Seq.fill(2)(timed(salted)).minBy(_._1)
      assert(pr == sr, s"salted result diverged: $sr != $pr")
      assert(pr._1 == 4000000L)
      info(f"hot-key join 4M rows: unsalted $pt%.2f s, salted $st%.2f s")
      // the hot key is ~3.8M rows in ONE sort-merge task unsalted vs 8
      // salted buckets; the expected gap is several x — 'beats' with no
      // margin keeps host noise (±25%) from flaking the pin
      assert(st < pt,
        f"salted ($st%.2f s) did not beat unsalted ($pt%.2f s)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold0)
  }
}
