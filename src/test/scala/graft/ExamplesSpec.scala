package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EventEnvelope, Sessions}
import graft.streaming._

/** End-to-end parity with the reference's shipped examples — each test
  * reproduces one `examples/processing/<name>/main.go` program on this
  * engine and asserts its observable output, so "a user of the reference
  * could switch" is executable evidence, not a claim.
  */
class ExamplesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-ckpt-ex-${System.nanoTime()}"), 4).getOrCreate()

  override def afterAll(): Unit = {
    QueryRepository.closeAll()
    spark.stop()
  }

  private val base = 1700000000000L
  private def ts(sec: Int) = new Timestamp(base + sec * 1000L)
  private def envs[T](values: Seq[T]): Seq[EventEnvelope[T]] =
    values.zipWithIndex.map { case (v, i) => EventEnvelope.at(ts(i), v) }

  test("examples/processing/basics: source -> Greater(50) -> subscriber") {
    val ps = new PubSub(spark)
    val received = mutable.Buffer.empty[Int]
    val q = QueryBuilder[Int](ps)
      .from("ex-basics-in")
      .connectTo(TypedOps.greater(50))
      .build()
      .subscribe(evs => received.synchronized {
        received ++= evs.map(_.content)
      })
      .run()
    // the reference publishes 100 events in 0..99 via InstantPublish
    ps.topic[Int]("ex-basics-in").publish(envs(0 until 100))
    q.drain(); q.close()
    assert(received.sorted == (51 to 99).toList)
    ps.close()
  }

  test("examples/processing/builder: Greater -> Map(*100) -> Convert -> " +
      "Even chain, then a windowed join of primary and secondary") {
    val ps = new PubSub(spark)
    // the typed chain of the reference's fluent builder demo
    val received = mutable.Buffer.empty[Int]
    val q = QueryBuilder[Double](ps)
      .from("ex-builder-in")
      .connectTo(TypedOps.greater(0.5))
      .connectTo(TypedOps.map((x: Double) => x * 100))
      .connectTo(TypedOps.convert((x: Double) => x.toInt))
      .connectTo(TypedOps.even[Int])
      .build()
      .subscribe(evs => received.synchronized {
        received ++= evs.map(_.content)
      })
      .run()
    ps.topic[Double]("ex-builder-in").publish(
      envs(Seq(0.2, 0.61, 0.75, 0.9, 0.33)))
    q.drain(); q.close()
    // 0.61*100=61 odd, 0.75*100=75 odd, 0.9*100=90 even
    assert(received.sorted == Seq(90))

    // the join leg: primary and secondary streams joined on id within a
    // temporal window (reference joins two map-typed streams on "id")
    import org.apache.spark.sql.functions.col
    val lt = ps.topic[Int]("ex-builder-primary")
    val rt = ps.topic[Int]("ex-builder-secondary")
    val joined = StreamJoins.windowedInner(
      lt.stream.toDF().select(col("content").as("id"),
        col("stamp.start_time").as("lts")),
      rt.stream.toDF().select(col("content").as("id"),
        col("stamp.start_time").as("rts")),
      "id", "lts", "rts", "10 seconds")
    val pairs = mutable.Buffer.empty[Int]
    val jq = joined.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        pairs.synchronized {
          pairs ++= b.collect().map(_.getAs[Int]("id"))
        }; ()
      }.start()
    lt.publish(Seq(EventEnvelope.at(ts(1), 90), EventEnvelope.at(ts(30), -1)))
    rt.publish(Seq(EventEnvelope.at(ts(2), 90), EventEnvelope.at(ts(30), -2)))
    jq.processAllAvailable(); jq.stop()
    assert(pairs.toSeq == Seq(90))
    ps.close()
  }

  test("examples/processing/customOperator: tokenize -> per-window word " +
      "counts via a batch subscription") {
    val ps = new PubSub(spark)
    val t = ps.topic[String]("ex-words-in")
    // FlatMap-tokenize like the reference, then a counting-free custom
    // aggregation per temporal window through subscribeBatch
    val words = TypedOps.tokenize(t.stream)
    val counts = mutable.Buffer.empty[Map[String, Int]]
    val sub = ps.subscribeBatch(words,
      TemporalWindowPolicy.tumbling("10 seconds")) { wb =>
      counts.synchronized {
        counts += wb.events.groupBy(identity).view.mapValues(_.size).toMap
      }
    }
    t.publish(Seq(
      EventEnvelope.at(ts(1), "to be or not to be"),
      EventEnvelope.at(ts(3), "be water"),
      EventEnvelope.at(ts(15), "trigger"))) // closes [0,10)
    sub.drain(); sub.close()
    assert(counts.headOption.contains(
      Map("to" -> 2, "be" -> 3, "or" -> 1, "not" -> 1, "water" -> 1)))
    ps.close()
  }
}
