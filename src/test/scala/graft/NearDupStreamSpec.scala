package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EventEnvelope, Sessions}
import graft.streaming._

/** Streaming approximate near-dup suppression
  * (TypedOps.nearDupWithinWatermark): planted near-duplicates arriving
  * within the watermark horizon are suppressed, distinct documents pass,
  * and the kept document surfaces with its ORIGINAL envelope. The
  * MinHash seed is fixed, so band collisions — and therefore every
  * assertion here — are deterministic.
  */
class NearDupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-ndstream-${System.nanoTime()}"), 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  // ~40 words so a one-word edit leaves shingle jaccard ~0.75+, far
  // above the 16x4 banding knee (collision probability > 0.99); with
  // the fixed seed the collision is a constant, not a coin flip
  private val docA = ("the quick brown fox jumps over the lazy dog while " +
    "seventeen sleepy pandas carefully arrange bamboo stalks beside the " +
    "quiet river and three ravens watch from a crooked pine tree " +
    "counting clouds drifting past the northern ridge before dusk")
  private val docB = docA.replace("ravens", "magpies") // near-dup of A
  private val docC = ("completely different content about distributed " +
    "query engines shuffling columnar batches across executor threads " +
    "with adaptive partition coalescing broadcast hash joins watermark " +
    "eviction and whole stage code generation keeping the hot loop tight " +
    "under vectorized parquet scans")

  test("near-dups within the horizon are suppressed; distinct docs pass " +
      "with their original envelopes") {
    val ps = new PubSub(spark)
    val t = ps.topic[String]("neardup-stream")
    val kept = TypedOps.nearDupWithinWatermark(
      delay = "5 seconds").apply(t.stream)
    val buf = mutable.Buffer.empty[EventEnvelope[String]]
    val q = kept.writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[EventEnvelope[String]], _: Long) =>
        buf.synchronized { buf ++= b.collect() }; ()
      }.start()

    // batch 1: A and C (distinct); batch 2: B (near-dup of A, inside
    // the horizon); batch 3: a far-future flush advances the watermark
    // past every granule window so the claim counts emit
    t.publish(Seq(EventEnvelope.at(ts(0), docA), EventEnvelope.at(ts(1), docC)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(2), docB)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(60), "flush marker document")))
    q.processAllAvailable()
    q.stop()

    val contents = buf.map(_.content).toSet
    assert(contents.contains(docA), "first occurrence was suppressed")
    assert(contents.contains(docC), "a distinct document was suppressed")
    assert(!contents.contains(docB),
      "near-duplicate inside the watermark horizon was NOT suppressed")
    // the kept doc carries its original stamp (first claimant's envelope)
    assert(buf.find(_.content == docA).get.stamp.start_time == ts(0))
    ps.close()
  }

  test("an exact duplicate re-arriving in a later batch within the " +
      "horizon is suppressed too (band claims all collide)") {
    val ps = new PubSub(spark)
    val t = ps.topic[String]("neardup-exact")
    val kept = TypedOps.nearDupWithinWatermark(
      delay = "5 seconds").apply(t.stream)
    val buf = mutable.Buffer.empty[String]
    val q = kept.writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[EventEnvelope[String]], _: Long) =>
        buf.synchronized { buf ++= b.collect().map(_.content) }; ()
      }.start()
    t.publish(Seq(EventEnvelope.at(ts(0), docA)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(2), docA)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(60), "flush marker document")))
    q.processAllAvailable()
    q.stop()
    assert(buf.count(_ == docA) == 1,
      s"expected exactly one emission of the duplicated doc, got $buf")
    ps.close()
  }

  test("auto-sized banding (nearDupWithinWatermarkAuto) reports its " +
      "plan and suppresses the same planted near-dup") {
    val ps = new PubSub(spark)
    val t = ps.topic[String]("neardup-auto")
    // horizon sized at 100k distinct docs -> rows track the background
    // collision base (lshPlanJaccard: ceil(ln(100000/256)/ln(10)) = 3)
    val (plan, op) = TypedOps.nearDupWithinWatermarkAuto(
      delay = "5 seconds", expectedHorizonDocs = 100000L)
    assert(plan.bitsPerBand == 3, s"unexpected auto rows: $plan")
    assert(plan.expectedRecall >= 0.999)
    val kept = op(t.stream)
    val buf = mutable.Buffer.empty[String]
    val q = kept.writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[EventEnvelope[String]], _: Long) =>
        buf.synchronized { buf ++= b.collect().map(_.content) }; ()
      }.start()
    t.publish(Seq(EventEnvelope.at(ts(0), docA), EventEnvelope.at(ts(1), docC)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(2), docB)))
    q.processAllAvailable()
    t.publish(Seq(EventEnvelope.at(ts(60), "flush marker document")))
    q.processAllAvailable()
    q.stop()
    assert(buf.contains(docA) && buf.contains(docC))
    assert(!buf.contains(docB),
      "near-duplicate not suppressed under the auto-sized banding")
    ps.close()
  }
}
