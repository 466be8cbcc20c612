package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump every query result to `outDir/<name>` parquet. A query that
    * throws must NOT vanish from the ledger (r11 lost 32 queries
    * silently this way): it gets a one-row parquet whose only column is
    * `__error`, so the driver's compare reports a loud schema/row
    * mismatch instead of an absent entry. Returns name -> error message
    * for the failures (also written as errors.json by main).
    * Factored out of main so VerifyContractSpec can drive the failure
    * path with an injected throwing query.
    */
  private[graft] def dumpAll(spark: SparkSession, sfDir: String,
      outDir: String,
      qs: Map[String, (SparkSession, String) => DataFrame])
      : Map[String, String] = {
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_VERIFY_PARTS widens the final write (default 1 — one
    // file per query for the driver's reader). At big mult fixtures the
    // single write task IS the wall clock (a 271M-row result writes one
    // parquet file single-threaded); the gate checkers glob
    // <name>/*.parquet, so a local scale run sets 8-16.
    val parts = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PARTS", "1").toInt
      .max(1)
    qs.foreach { case (name, fn) =>
      // repartition(1), NOT coalesce(1): coalesce folds into the parent
      // stage and collapses the whole upstream plan to ONE task, so every
      // heavy query would compute single-threaded. repartition inserts a
      // shuffle boundary — upstream runs at full parallelism, only the
      // final write is one task (one file per query for the driver).
      try fn(spark, sfDir).repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name FAILED: $msg")
        failed(name) = msg
        try {
          import spark.implicits._
          Seq(msg.take(2000)).toDF("__error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    failed.toMap
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def writeErrors(outDir: String,
      failed: Map[String, String]): Unit = {
    val errJson = failed
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
  }

  def main(args: Array[String]): Unit = {
    graft.core.Sessions.assertJdkOpens()
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.quietSupersededCheckpointWarnings()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q_a,q_b narrows the dump for focused
    // iteration (tools/check_correctness.py compares whatever is dumped).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val qs = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    val failed = dumpAll(spark, sfDir, outDir, qs)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    writeErrors(outDir, failed)
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size}/${qs.size} queries FAILED: " +
        failed.keys.mkString(", "))
    spark.stop()
  }
}
