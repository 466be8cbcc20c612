package graft.examples

import org.apache.spark.sql.SparkSession

import graft.core.{EventEnvelope, Sessions}
import graft.streaming._

/** The reference's hello-world queries, end-to-end on this engine
  * (reference: README.md:62-74 and examples/pubsub/batchSubscriberCount).
  * Run: sbt "runMain graft.examples.StreamingDemo"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.streaming.checkpointLocation",
          s"/tmp/graft-demo-ckpt-${System.nanoTime()}"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ps = new PubSub(spark)

    // 1. README query: numbers -> Smaller(50) -> subscribe
    val received = scala.collection.mutable.Buffer.empty[Int]
    val q = QueryBuilder[Int](ps)
      .from("numbers")
      .connectTo(TypedOps.smaller(50))
      .build()
      .subscribe(evs => received.synchronized { received ++= evs.map(_.content) })
      .run()
    ps.topic[Int]("numbers").publish(
      (1 to 100).map(i => EventEnvelope.at(
        new java.sql.Timestamp(1700000000000L + i * 1000L), i)))
    q.drain()
    println(s"[demo] smaller(50): received ${received.size} events, " +
      s"max=${received.max}")
    q.close()

    // 2. Counting-window batch subscriber: 150 events in windows of 5
    //    (reference: examples/pubsub/batchSubscriberCount/main.go:15-21)
    val t = ps.topic[Int]("batched")
    val windows = scala.collection.mutable.Buffer.empty[WindowBatch[Int]]
    val wq = StatefulOps.countingWindows[Int](5, 5)(t.stream)
      .writeStream.outputMode("append")
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[WindowBatch[Int]], _: Long) =>
          windows.synchronized { windows ++= b.collect() }; ()
      }.start()
    t.publish((1 to 150).map(i => EventEnvelope.at(
      new java.sql.Timestamp(1700000000000L + i * 1000L), i)))
    wq.processAllAvailable()
    wq.stop()
    println(s"[demo] counting(5,5): ${windows.size} windows, " +
      s"first=${windows.sortBy(_.windowId).head.events}")

    ps.close()
    spark.stop()
  }
}
