package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions
import graft.operators.Ann

/** Ann.lshPlan / Ann.nearDupPairsAuto — the executable form of the
  * hot-bucket guard's "retune bitsPerBand to corpus size" advice.
  *
  * The sizing math is pinned directly (bits tracks log2(n/targetBucket),
  * bands reach the recall target via the banding formula, the capped
  * case reports its achieved recall instead of lying), and the behavior
  * is pinned at the operator level: a corpus large enough that FIXED
  * low bits trips the hot-bucket guard completes under the auto-sized
  * scheme and still finds every planted near-duplicate pair.
  */
class AutoLshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[8]")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-wh-${System.nanoTime()}"), 8).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bits tracks corpus size: E[bucket] pinned at targetBucket") {
    // n = targetBucket * 2^k gives exactly k bits (within the clamp)
    assert(Ann.lshPlan(256L << 10, 0.95).bitsPerBand == 10)
    assert(Ann.lshPlan(256L << 18, 0.95).bitsPerBand == 18)
    // a billion-vector corpus resolves to ~21 bits, not the fixed 8
    // (22 from n/targetBucket, stepped down once because holding the
    // 0.999 recall target at 22 bits would need >maxBands bands)
    assert(Ann.lshPlan(1000000000L, 0.95).bitsPerBand == 21)
    // tiny corpora clamp at minBits
    assert(Ann.lshPlan(100L, 0.95).bitsPerBand == 6)
    assert(Ann.lshPlan(1L, 0.95).bitsPerBand == 6)
  }

  test("bands hold the recall target at the threshold (banding formula)") {
    for (n <- Seq(10000L, 1000000L, 100000000L);
         t <- Seq(0.9, 0.95, 0.99)) {
      val plan = Ann.lshPlan(n, t)
      val p = 1.0 - math.acos(t) / math.Pi
      val recall =
        1.0 - math.pow(1.0 - math.pow(p, plan.bitsPerBand), plan.nBands)
      assert(plan.expectedRecall >= 0.999,
        s"n=$n t=$t: $plan misses the recall target")
      assert(math.abs(plan.expectedRecall - recall) < 1e-12,
        s"reported recall disagrees with the formula at n=$n t=$t")
    }
  }

  test("more bits per band demands more bands (volume/recall trade)") {
    val loose = Ann.lshPlan(256L << 8, 0.95)
    val tight = Ann.lshPlan(256L << 16, 0.95)
    assert(tight.bitsPerBand > loose.bitsPerBand)
    assert(tight.nBands >= loose.nBands)
  }

  test("an unreachable recall target is REPORTED, never silently missed") {
    // low threshold + tiny band budget: even minBits cannot reach the
    // target, so the plan lands at (minBits, maxBands) and its
    // expectedRecall says what the scheme actually achieves
    val plan = Ann.lshPlan(1000000000L, threshold = 0.5,
      targetRecall = 0.9999, maxBands = 4)
    assert(plan.bitsPerBand == 6, s"capped plan must fall to minBits: $plan")
    assert(plan.nBands == 4)
    assert(plan.expectedRecall < 0.9999,
      s"capped plan claims the unreachable target: $plan")
    val p = 1.0 - math.acos(0.5) / math.Pi
    val achievable = 1.0 - math.pow(1.0 - math.pow(p, 6), 4.0)
    assert(math.abs(plan.expectedRecall - achievable) < 1e-12)
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException](Ann.lshPlan(0L, 0.95))
    intercept[IllegalArgumentException](Ann.lshPlan(10L, 1.0))
    intercept[IllegalArgumentException](Ann.lshPlan(10L, 0.95,
      targetRecall = 1.0))
  }

  /** Deterministic spread background (the SkewTortureSpec generator):
    * components uniform-ish in [-1, 1) from xxhash64 of the flat index.
    */
  private def background(n: Long, dim: Int) =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col("id") * dim + j + 7L), lit(2000))
          .cast("double") / 1000 - 1).cast("float")).as("embedding"))

  test("under-resolved fixed bits trip the guard; the auto-sized scheme " +
      "completes and finds every planted near-dup pair") {
    import spark.implicits._
    val n = 12000L
    val dim = 16
    val base = background(n, dim)
    // plant 20 near-dup pairs: vector i paired with a copy whose first
    // component is nudged by 0.05 — cosine stays well above the 0.95
    // cut while the vectors differ (NOT the trivial identical case,
    // which collides in every band by construction)
    val dups = base.where(col("vec_id") % lit(600) === 0)
      .select((col("vec_id") + lit(1000000)).as("vec_id"),
        concat(
          slice(transform(col("embedding"), x => x + lit(0.05f)), 1, 1),
          slice(col("embedding"), 2, dim - 1)).as("embedding"))
    val emb = base.unionByName(dups)

    // fixed bits=3: 8 buckets over 12 020 vectors — pigeonhole puts the
    // worst bucket at >= n/8 ~ 1500 > maxBucket, and the guard trips
    val trip = intercept[IllegalStateException] {
      Ann.nearDupPairs(emb, dim, 0.95, nBands = 4, bitsPerBand = 3,
        maxBucket = 1024).collect()
    }
    assert(trip.getMessage.contains("under-resolved"))

    // the auto scheme sizes bits from the corpus count and completes
    val pairs = Ann.nearDupPairsAuto(emb, dim, 0.95, maxBucket = 1024)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0L until n by 600L).map(i => (i, i + 1000000)).toSet
    assert(planted.subsetOf(pairs),
      s"auto scheme missed planted pairs: ${planted -- pairs}")
    // precision stays exact: the verification stage cuts on true cosine,
    // so every emitted pair really is above the threshold (recomputed
    // here in-JVM from the raw vectors)
    val vecs = emb.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    pairs.foreach { case (a, b) =>
      val c = cos(vecs(a), vecs(b))
      assert(math.round(c * 10000) >= 9500,
        s"auto emitted a sub-threshold pair ($a,$b) at cosine $c")
    }
  }
}
