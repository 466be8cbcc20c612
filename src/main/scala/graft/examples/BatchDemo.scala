package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{Ops, Windows}

/** The reference's processing examples on the batch surface
  * (reference: examples/processing/basics/main.go,
  * examples/processing/customOperator/main.go — per-window word count).
  * Run: sbt "runMain graft.examples.BatchDemo"
  */
object BatchDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // basics: ints -> greater(10) -> even -> count
    val nums = (1 to 100).map(_.toDouble).toDF("content")
    val filtered = (Ops.greater(col("content"), 10.0) andThen
      Ops.even(col("content")))(nums)
    println(s"[demo] basics: ${filtered.count()} of 100 pass (>10 and even)")

    // custom operator: word count per 1-hour window over the doc fixture
    val events = graft.queries.Tables.load(
      spark, "/root/testdata/sf0.001", "events")
    val wc = Windows.wordCount(col("ts"), col("event_type"), "1 hour")(events)
    println(s"[demo] wordCountWindow: ${wc.count()} (window, word) rows")

    spark.stop()
  }
}
