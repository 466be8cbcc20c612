package graft.core

import org.apache.spark.sql.SparkSession

/** One place to build correctly-tuned sessions for this engine.
  *
  * Scale stance: these settings are what we would ship to a 1000-executor
  * cluster, modulo `master`. AQE handles runtime re-planning (skew joins,
  * partition coalescing); shuffle partitions default low for local mode and
  * would be raised (or left to AQE) on a real cluster.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    tune(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()

  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.spill.compress", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")

  /** Quiet the "RDD was locally checkpointed, its lineage has been
    * truncated and cannot be recomputed after unpersisting" WARN spam.
    * The two-generation checkpoint discipline (Components / Bpe /
    * CacheHygiene) unpersists SUPERSEDED generations on purpose — the
    * data is never referenced again, so the warning describes intended
    * behavior, and at bench scale it floods the tail of the log the
    * driver captures. Scoped to the org.apache.spark.rdd category only
    * (scheduler/storage warnings stay on).
    */
  def quietSupersededCheckpointWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

  /** Streaming-at-scale add-on: RocksDB state store. The default in-memory
    * (HDFS-backed) provider holds all keyed state on-heap — fine for tests,
    * fatal for 100 TB keyed counting windows / stream joins. RocksDB spills
    * state to local disk with incremental checkpointing.
    *
    * Exercised by RocksDbStateSpec (dedup + keyed gapless under this
    * provider, outputs identical to the in-memory store) and by
    * StreamBench under `SPARK_GRAFT_STATE_STORE=rocksdb`; the measured
    * cost is in SCALE.md §"RocksDB state store".
    */
  def tuneLargeState(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
}
