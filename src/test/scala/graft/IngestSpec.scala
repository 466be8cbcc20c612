package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EventEnvelope, Sessions}
import graft.streaming._

/** Streaming corpus ingest (TypedOps.corpusIngest): quality gate first,
  * then watermark-bounded duplicate suppression — near-dup bands for
  * shingle-able documents, exact dedup for short ones (the split that
  * keeps DISTINCT short docs from clustering on the sentinel signature).
  */
class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-ingest-${System.nanoTime()}"), 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  private val docA = ("the quick brown fox jumps over the lazy dog while " +
    "seventeen sleepy pandas carefully arrange bamboo stalks beside the " +
    "quiet river and three ravens watch from a crooked pine tree " +
    "counting clouds drifting past the northern ridge before dusk")
  private val docANear = docA.replace("ravens", "magpies")
  private val docB = ("completely different content about distributed " +
    "query engines shuffling columnar batches across executor threads " +
    "with adaptive partition coalescing broadcast hash joins watermark " +
    "eviction and whole stage code generation keeping the hot loop tight " +
    "under vectorized parquet scans")
  // < 5 words (no shingles) but stopword-rich enough to clear the
  // quality gate — they must exercise the short-doc dedup path, not die
  // in the gate
  private val shortX = "this is a note"
  private val shortY = "it was the memo"
  private val junk = "!!! ??? ... ;;; ::: (((" // punct-heavy: quality ~0

  test("quality gate drops junk; near-dups and exact repeats are " +
      "suppressed; distinct short docs BOTH pass") {
    val ps = new PubSub(spark)
    val t = ps.topic[String](s"ingest-${System.nanoTime()}")
    val kept = TypedOps.corpusIngest(delay = "5 seconds").apply(t.stream)
    val buf = mutable.Buffer.empty[EventEnvelope[String]]
    val q = kept.writeStream.outputMode("append")
      .foreachBatch { (b: Dataset[EventEnvelope[String]], _: Long) =>
        buf.synchronized { buf ++= b.collect() }; ()
      }.start()

    t.publish(Seq(
      EventEnvelope.at(ts(0), docA),
      EventEnvelope.at(ts(1), docB),
      EventEnvelope.at(ts(1), shortX),
      EventEnvelope.at(ts(2), junk)))
    q.processAllAvailable()
    t.publish(Seq(
      EventEnvelope.at(ts(3), docANear), // near-dup of A within horizon
      EventEnvelope.at(ts(3), docA), // exact repeat within horizon
      EventEnvelope.at(ts(4), shortY), // DISTINCT short doc
      EventEnvelope.at(ts(4), shortX))) // exact short repeat
    q.processAllAvailable()
    // far-future flush closes the near-dup claim windows
    t.publish(Seq(EventEnvelope.at(ts(60),
      "flush marker document with enough words to pass the quality gate " +
      "and the shingle threshold for the long branch of the pipeline")))
    q.processAllAvailable()
    q.stop()
    ps.close()

    val contents = buf.map(_.content)
    assert(contents.count(_ == docA) == 1, "docA must pass exactly once")
    assert(contents.contains(docB), "distinct long doc was suppressed")
    assert(!contents.contains(docANear),
      "near-duplicate slipped through the band suppression")
    assert(!contents.contains(junk), "junk survived the quality gate")
    assert(contents.count(_ == shortX) == 1,
      "short doc must pass exactly once")
    assert(contents.contains(shortY),
      "a DISTINCT short doc was clustered away — the split is broken")
    // envelopes survive the pipeline intact (first claimant's stamp)
    assert(buf.find(_.content == docA).get.stamp.start_time == ts(0))
  }
}
