package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-module maps; every key has either a DuckDB
  * oracle in `oracleSql` (exact hash-compared) or is a declared
  * rows-only check. Query functions take (session, sfDir) and must be
  * deterministic incl. row order and float bits (see module docs).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ AnnQueries.queries ++ PipelineQueries.queries ++
      IngestQueries.queries ++ CurationQueries.queries ++ LakeQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ EventQueries.oracleSql ++
      TextQueries.oracleSql ++ AnnQueries.oracleSql ++ PipelineQueries.oracleSql ++
      IngestQueries.oracleSql ++ CurationQueries.oracleSql ++ LakeQueries.oracleSql
}
