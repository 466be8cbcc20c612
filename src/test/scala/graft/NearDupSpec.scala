package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sessions
import graft.operators.Ann

/** Embedding near-duplicate detection (Ann.nearDupPairs): planted
  * cosine>0.99 duplicates MUST be found (multi-band hyperplane LSH recall
  * at that similarity is ~1 - (1 - 0.955^bits)^bands ~ 1.0), and distant
  * pairs must NOT appear (the exact-cosine verification step filters any
  * accidental bucket collision).
  */
class NearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val Dim = 32

  /** 100 well-separated random base vectors; the first 20 each get a
    * planted near-duplicate (id+1000) at cosine > 0.99 (tiny additive
    * noise relative to the base norm).
    */
  private def corpus = {
    val rng = new scala.util.Random(7)
    val bases = (0 until 100).map { i =>
      (i.toLong, Array.fill(Dim)(rng.nextGaussian().toFloat))
    }
    val dups = bases.take(20).map { case (id, v) =>
      (id + 1000L, v.map(x => x + rng.nextGaussian().toFloat * 0.01f))
    }
    (bases ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("every planted cosine>0.99 duplicate pair is found") {
    val pairs = Ann.nearDupPairs(corpus, Dim, threshold = 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0L until 20L).map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${planted -- pairs}")
  }

  test("no pair below the threshold survives verification") {
    val out = Ann.nearDupPairs(corpus, Dim, threshold = 0.99)
      .select("a", "b", "score")
      .as[(Long, Long, Double)].collect()
    assert(out.forall(_._3 >= 0.99))
    // random 32-dim gaussians are near-orthogonal: nothing but the
    // planted pairs should clear 0.99
    val planted = (0L until 20L).map(i => (i, i + 1000L)).toSet
    assert(out.map(r => (r._1, r._2)).toSet == planted)
  }

  test("pair set is invariant under input partitioning") {
    val once = Ann.nearDupPairs(corpus, Dim, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val repart = Ann.nearDupPairs(corpus.repartition(7), Dim, threshold = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(once == repart)
    assert(once.nonEmpty)
  }

  test("the fixture-threshold configuration also verifies exactly") {
    // the demoted fixed-scheme ledger query's shape (now spec-only —
    // the ledger rides q_embed_neardup_auto): moderate threshold. Every
    // emitted pair's score must equal the exact (rounded) cosine.
    val out = Ann.nearDupPairs(corpus, Dim, threshold = 0.4)
    import org.apache.spark.sql.functions._
    val vecs = corpus.select(col("vec_id"), col("embedding"))
    val checked = out
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("va")), "a")
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("vb")), "b")
      .select(col("score"),
        graft.queries.Det.r4(graft.functions.VectorFunctions.cosine(
          col("va"), col("vb"))).as("exact"))
      .as[(Double, Double)].collect()
    assert(checked.nonEmpty)
    assert(checked.forall { case (s, e) => s == e })
  }
}
