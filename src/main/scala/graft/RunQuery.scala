package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Ad-hoc query runner for iteration: prints row count and a sample for
  * each named query against SPARK_GRAFT_SF_DIR.
  * Run: sbt "runMain graft.RunQuery <queryName...>"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"\n========== $name ==========")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries.getOrElse(name, {
        val near = SparkEntry.queries.keys
          .filter(_.contains(name.stripPrefix("q_"))).toSeq.sorted
        sys.error(s"unknown query '$name'" + (
          if (near.nonEmpty) s" — did you mean: ${near.mkString(", ")}?"
          else s" — ${SparkEntry.queries.size} known, see SparkEntry"))
      })(spark, sfDir)
      val n = df.count()
      println(f"rows: $n  (${(System.nanoTime() - t0) / 1e9}%.2f s)")
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
