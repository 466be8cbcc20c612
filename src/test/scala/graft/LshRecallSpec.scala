package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions

/** Empirical recall of the MinHash-LSH near-dup path against the exact
  * shingle-Jaccard path, on the real sf0.001 fixture corpus.
  *
  * The banding theory (16 bands x 4 rows over 64 perms) says a pair at
  * j >= 0.8 collides in >= 1 band with probability 1 - (1-j^4)^16 >
  * 0.999 — this spec turns that comment into evidence: EVERY pair the
  * exact path emits must also be emitted by the LSH path, with the same
  * (rounded) jaccard, since both verify candidates exactly.
  */
class LshRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[8]"), 8).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val SfDir = "/root/testdata/sf0.001"

  test("every exact j>=0.8 pair is found by the MinHash-LSH path") {
    import spark.implicits._
    val exact = SparkEntry.queries("q_ngram_jaccard")(spark, SfDir)
      .select("a", "b", "j").as[(Long, Long, Double)].collect()
    val lsh = SparkEntry.queries("q_minhash_lsh")(spark, SfDir)
      .select("a", "b", "j").as[(Long, Long, Double)].collect()
    assert(exact.nonEmpty, "fixture must contain j>=0.8 pairs")
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val lshPairs = lsh.map(r => (r._1, r._2)).toSet
    assert(exactPairs.subsetOf(lshPairs),
      s"LSH missed ${exactPairs -- lshPairs} of ${exactPairs.size} pairs")
    // identical exact-jaccard verification on the common pairs
    val exactJ = exact.map(r => (r._1, r._2) -> r._3).toMap
    val lshJ = lsh.map(r => (r._1, r._2) -> r._3).toMap
    assert(exactPairs.forall(p => exactJ(p) == lshJ(p)))
    // and the LSH path never emits a pair the exact path rejects: both
    // filter on the same exact j threshold, so the sets must be EQUAL
    assert(lshPairs == exactPairs)
  }
}
