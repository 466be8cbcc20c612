package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2's inventory is represented by at least
  * one entry in `queries`; SQL-expressible ones carry a DuckDB oracle in
  * `oracleSql` with IDENTICAL column names (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** All registered query definitions, keyed by query name. */
  def allDefs: Map[String, QueryDef] =
    RelationalQueries.defs ++
      WindowQueries.defs ++
      JoinQueries.defs ++
      TextQueries.defs ++
      TokenizerQueries.defs ++
      SimilarityQueries.defs ++
      MultimodalQueries.defs ++
      AnalyticsQueries.defs ++
      PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q1_pricing").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, d) => name -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql), _)) => name -> sql }

  /** The bench headliners (run by graft.Bench at sf0.1). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.collect { case (name, d) if d.bench => name -> d.build }
}
