package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Build a larger-SF fixture from an existing one by union-multiplying
  * the three scale-sensitive tables (documents, embeddings, events) with
  * id offsets — the local stand-in for the next scale factor, used to
  * extend SCALE.md's scaling table with a third point where the caps
  * bind. Remaining tables are copied verbatim.
  *
  * Replicas must not manufacture cross-replica near-duplicates (that
  * would change the workload's character, not its size), so each replica
  * is perturbed deterministically:
  *  - documents: every word gets a replica tag suffix. Within a replica
  *    the token sequence (hence every n-gram shingle, hence every
  *    pairwise jaccard) is EXACTLY the original's, so dup density grows
  *    with the corpus as it would in production; across replicas no
  *    shingle can match. (A hash-sorted word shuffle was tried first and
  *    rejected: canonicalizing word order makes unrelated documents
  *    sharing any n-word vocabulary subset align — candidate pairs
  *    exploded 321× at mult=3, an artifact, not a workload.)
  *  - embeddings: a replica-specific sign mask (negate dims where
  *    (i >> (r-1)) & 1 == 1) — norms preserved, cross-replica cosine
  *    collapses toward 0.
  *  - events: id offsets only; the hourly grid keeps its shape, so
  *    users-per-hour multiplies — exactly the regime the correlation
  *    cohort cap exists for.
  *
  * Usage: runMain graft.ScaleFixture <srcDir> <outDir> [mult]
  */
object ScaleFixture {

  private val IdOffset = 100000000L

  /** Replica word tagging: suffix every token with "~r". Order-preserving
    * and injective per replica — within-replica shingle sets are
    * isomorphic to the original's (identical jaccard structure), across
    * replicas disjoint.
    */
  private def reword(r: Int): Column =
    concat_ws(" ", transform(
      filter(split(col("text"), "\\s+"), w => length(w) > 0),
      w => concat(w, lit(s"~$r"))))

  /** Replica-specific sign mask over embedding dims. */
  private def signFlip(r: Int): Column =
    transform(col("embedding"), (x, i) =>
      when(shiftright(i, r - 1) % 2 === 1, -x).otherwise(x))

  private def multiplied(df: DataFrame, mult: Int)(
      replica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until mult).map {
      case 0 => df
      case r => replica(df, r)
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark: SparkSession = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, mult)
    println(s"""{"scale_fixture":{"src":"$src","out":"$out","mult":$mult}}""")
    spark.stop()
  }

  /** The multiply-and-write body, session supplied by the caller (main
    * owns its session and stops it; FixtureSchemaSpec drives this with
    * the shared test session).
    */
  def run(spark: SparkSession, src: String, out: String, mult: Int): Unit = {
    // events.ts round-trips in whatever unit the source carries:
    // nanosAsLong lets a NANOS-era fixture read (as nano longs, written
    // back as longs); a native-MICROS fixture passes through as
    // TIMESTAMP_NTZ. Tables.load dispatches on the observed type at
    // query time, so both round-trips are equivalent downstream.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new java.io.File(out).mkdirs()

    multiplied(spark.read.parquet(s"$src/documents.parquet"), mult) {
      (df, r) => df
        .withColumn("doc_id", col("doc_id") + lit(r * IdOffset))
        .withColumn("text", reword(r))
        .withColumn("n_chars", length(col("text")))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    multiplied(spark.read.parquet(s"$src/embeddings.parquet"), mult) {
      (df, r) => df
        .withColumn("vec_id", col("vec_id") + lit(r * IdOffset))
        .withColumn("embedding", signFlip(r))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    multiplied(spark.read.parquet(s"$src/events.parquet"), mult) {
      (df, r) => df
        .withColumn("event_id", col("event_id") + lit(r * IdOffset))
        .withColumn("user_id", col("user_id") + lit(r * IdOffset))
    }.write.mode("overwrite").parquet(s"$out/events.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      if (java.nio.file.Files.exists(from))
        java.nio.file.Files.copy(from,
          java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
