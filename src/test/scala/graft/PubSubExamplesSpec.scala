package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EventEnvelope, Sessions}
import graft.streaming._

/** End-to-end parity with the reference's `examples/pubsub` programs —
  * the pub/sub sibling of ExamplesSpec (which pins `examples/processing`).
  * Each test reproduces one program's observable behavior:
  *
  *  - basics: subscribe by topic, publish 42, receive it.
  *  - asynchronous: TWO subscribers on one stream, 1000 events, both
  *    receive every event (asynchronous/main.go:15-45).
  *  - synchronous: same fan-out, but the publisher waits for consumption
  *    before continuing (synchronous/main.go:22 — WithSubscriberSync).
  *  - batchSubscriberCount: 150 events through a counting(5,5) policy →
  *    30 batches of 5 (batchSubscriberCount/main.go:15-21).
  *  - batchSubscriberTemporal: 500 ms windows, events across three
  *    windows → exactly 2 COMPLETED windows of sizes 2 and 1
  *    (batchSubscriberTemporal/main.go:19-20, 44-63).
  *  - next: the shipped main.go is an empty placeholder (13 bytes,
  *    `package main` only), so the test pins the API the program is
  *    named for — SelectNext delivery, one event per firing
  *    (pkg/pubsub/subscriber.go:184-190, GetAndRemoveNextEvent).
  *
  * The two-subscriber programs are the reason Topic multicasts: Spark's
  * MemoryStream truncates its batches on per-query commit, so subscribers
  * must not share one source instance (see Topic's scaladoc).
  */
class PubSubExamplesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    Sessions.tune(SparkSession.builder().master("local[4]")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-ckpt-psex-${System.nanoTime()}"), 4).getOrCreate()

  override def afterAll(): Unit = {
    QueryRepository.closeAll()
    spark.stop()
  }

  private val base = 1700000000000L
  private def ts(ms: Long) = new Timestamp(base + ms)
  private def envs[T](values: Seq[T]): Seq[EventEnvelope[T]] =
    values.zipWithIndex.map { case (v, i) =>
      EventEnvelope.at(ts(i * 1000L), v)
    }

  test("examples/pubsub/basics: subscribe by topic, publish 42, receive") {
    val ps = new PubSub(spark)
    val t = ps.topic[Int]("my-topic")
    val received = mutable.Buffer.empty[Int]
    val sub = ps.subscribe(t.stream, owner = Some(t)) { evs =>
      received.synchronized { received ++= evs.map(_.content) }
    }
    val pub = ps.registerPublisher[Int]("my-topic")
    pub.publish(Seq(EventEnvelope.at(ts(0), 42)))
    sub.drain()
    assert(received.toSeq == Seq(42))
    pub.close(); sub.close()
    ps.close()
  }

  test("examples/pubsub/asynchronous: two subscribers on one stream " +
      "each receive all 1000 events, publisher never waits") {
    val maxEvents = 1000
    val ps = new PubSub(spark)
    // AddOrReplaceStream = explicit topic with manual lifecycle
    val t = ps.createTopic[Int]("Some Integers")
    val rec1 = mutable.Buffer.empty[Int]
    val rec2 = mutable.Buffer.empty[Int]
    val sub1 = ps.subscribe(t.stream, owner = Some(t)) { evs =>
      rec1.synchronized { rec1 ++= evs.map(_.content) }
    }
    val sub2 = ps.subscribe(t.stream, owner = Some(t)) { evs =>
      rec2.synchronized { rec2 ++= evs.map(_.content) }
    }
    val pub = ps.registerPublisher[Int]("Some Integers")
    // the asynchronous stream decouples publish from consumption: all
    // events go out before any drain
    pub.publish(envs(0 until maxEvents))
    sub1.drain(); sub2.drain()
    assert(rec1.toSeq == (0 until maxEvents))
    assert(rec2.toSeq == (0 until maxEvents))
    pub.close()
    sub1.close(); sub2.close()
    assert(ps.tryRemoveTopic[Int]("Some Integers"))
    ps.close()
  }

  test("examples/pubsub/synchronous: publisher waits for both " +
      "subscribers to consume before publishing on") {
    val maxEvents = 1000
    val chunk = 100
    val ps = new PubSub(spark)
    val t = ps.createTopic[Int]("Some Integers")
    val rec1 = mutable.Buffer.empty[Int]
    val rec2 = mutable.Buffer.empty[Int]
    val sub1 = ps.subscribe(t.stream, owner = Some(t)) { evs =>
      rec1.synchronized { rec1 ++= evs.map(_.content) }
    }
    val sub2 = ps.subscribe(t.stream, owner = Some(t)) { evs =>
      rec2.synchronized { rec2 ++= evs.map(_.content) }
    }
    val pub = ps.registerPublisher[Int]("Some Integers")
    val all = envs(0 until maxEvents)
    // WithSubscriberSync(true): publish blocks until subscribers consume.
    // Here that is the micro-batch drain — after each publish the
    // publisher waits until BOTH subscriptions have delivered everything
    // published so far (chunked: per-event drains would time 1000
    // micro-batches; the synchronization contract per publish call is
    // identical).
    all.grouped(chunk).foreach { c =>
      pub.publish(c)
      sub1.drain(); sub2.drain()
      val n1 = rec1.synchronized(rec1.size)
      val n2 = rec2.synchronized(rec2.size)
      assert(n1 == rec2.synchronized(rec2.size))
      assert(n1 % chunk == 0 && n1 > 0 && n2 > 0)
    }
    assert(rec1.toSeq == (0 until maxEvents))
    assert(rec2.toSeq == (0 until maxEvents))
    pub.close(); sub1.close(); sub2.close()
    assert(ps.tryRemoveTopic[Int]("Some Integers"))
    ps.close()
  }

  test("examples/pubsub/batchSubscriberCount: 150 events, counting " +
      "windows of 5 -> 30 batches of 5, contents in order") {
    val totalEvents = 150
    val batchSize = 5
    val ps = new PubSub(spark)
    val t = ps.topic[Int]("batch-example")
    val batches = mutable.Buffer.empty[Seq[Int]]
    val sub = ps.subscribeBatch(t.stream,
      CountingWindowPolicy(batchSize, batchSize), Some(t)) { wb =>
      batches.synchronized { batches += wb.events }
    }
    // reference: InstantPublishByTopic(topic, i) for i in 1..150; stamps
    // here are explicit so event-time order equals publish order
    t.publish(envs(1 to totalEvents))
    sub.drain(); sub.close()
    assert(batches.size == totalEvents / batchSize)
    assert(batches.forall(_.size == batchSize))
    assert(batches.toSeq.flatten == (1 to totalEvents))
    ps.close()
  }

  test("examples/pubsub/batchSubscriberTemporal: tumbling windows, " +
      "events across three windows -> two completed windows of sizes 2 " +
      "and 1") {
    // The reference program runs 500 ms windows against wall-clock
    // sleeps; this engine's windowId contract is epoch-seconds (shared
    // with the grouped-agg temporal operators and the certified
    // oracles), so the program is reproduced at 10x time scale — 5 s
    // windows, the same three-window event layout, the same observable
    // outcome: a batch is emitted when an event arrives outside the
    // current window, and the final window never completes.
    val ps = new PubSub(spark)
    val t = ps.topic[Int]("temporal-window-example")
    val windows = mutable.Buffer.empty[Seq[Int]]
    val sub = ps.subscribeBatch(t.stream,
      TemporalWindowPolicy.tumbling("5 seconds"), Some(t)) { wb =>
      windows.synchronized { windows += wb.events }
    }
    // Window 1: events 1 (t=0s) and 2 (t=1s)
    t.publish(Seq(EventEnvelope.at(ts(0), 1), EventEnvelope.at(ts(1000), 2)))
    // event 3 lands past the first boundary -> flushes window 1
    t.publish(Seq(EventEnvelope.at(ts(7000), 3)))
    // event 4 lands past the next boundary -> flushes window 2
    t.publish(Seq(EventEnvelope.at(ts(13000), 4)))
    sub.drain(); sub.close()
    // the window holding event 4 is still open — exactly the two
    // COMPLETED windows the reference program waits for
    assert(windows.toSeq == Seq(Seq(1, 2), Seq(3)))
    ps.close()
  }

  test("examples/pubsub/next: SelectNext policy delivers one event per " +
      "firing, in order") {
    val ps = new PubSub(spark)
    val t = ps.topic[Int]("next-example")
    val fired = mutable.Buffer.empty[Seq[Int]]
    val sub = ps.subscribeBatch(t.stream, SelectNext, Some(t)) { wb =>
      fired.synchronized { fired += wb.events }
    }
    t.publish(envs(Seq(10, 20, 30, 40, 50)))
    sub.drain(); sub.close()
    assert(fired.toSeq == Seq(Seq(10), Seq(20), Seq(30), Seq(40), Seq(50)))
    ps.close()
  }
}
