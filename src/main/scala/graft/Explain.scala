package graft

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Plan inspector: prints the formatted physical plan of each query (or
  * the ones named in args) so scan pushdown, broadcast choices, and
  * whole-stage-codegen spans can be reviewed.
  * Run: sbt "runMain graft.Explain [queryName...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.benchQueries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"[explain] failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
