package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{ManifestBatchSource, Tables}

/** Driver-visible lakehouse query: the ManifestLog round trip through
  * the BATCH SQL FACE, oracle-checked against DuckDB.
  *
  * `lake_sql_read` builds a manifest table from the round's lineitem
  * parquet (write → MOR delete of every `l_orderkey % 10 = 3` order),
  * then reads it back the way a non-Scala consumer would —
  * `spark.read.format(ManifestBatchSource)` → temp view → plain SQL
  * aggregate. The oracle applies the same deletion as a WHERE clause
  * over the raw parquet, so a DV leak (dead rows resurrected, live
  * rows dropped) or an alignment bug in the batch reader breaks the
  * hash, not just a spec.
  *
  * Scale shape: the table writes range-clustered across 4 files; the
  * SQL face plans one partition per live file with DV positions loaded
  * executor-side (deleted-row-sized), and the MOR delete itself is a
  * metadata-only commit — the same plan a 100 TB table would want.
  * Determinism: rebuilt from scratch every call (versions/paths fixed),
  * BIGINT aggregates, ordered output.
  */
object LakeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_sql_read" -> ((s, dir) => lakeSqlRead(s, dir)),
    "lake_time_travel" -> ((s, dir) => lakeTimeTravel(s, dir)),
    "lake_change_feed" -> ((s, dir) => lakeChangeFeed(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "lake_sql_read" ->
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey % 10 <> 3
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "lake_time_travel" ->
      """SELECT 'v1' AS v_tag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey % 4 = 0
        |UNION ALL
        |SELECT 'v2', COUNT(*),
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |FROM lineitem WHERE l_orderkey % 4 IN (0, 1)
        |UNION ALL
        |SELECT 'v3_head', COUNT(*),
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |FROM lineitem
        |WHERE l_orderkey % 4 IN (0, 1) AND l_orderkey % 20 <> 0
        |ORDER BY v_tag""".stripMargin,

    "lake_change_feed" ->
      """SELECT CAST(1 AS INT) AS _commit_version, 'insert' AS _change_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem WHERE l_orderkey % 4 = 0
        |UNION ALL
        |SELECT CAST(2 AS INT), 'insert',
        |  COUNT(*), CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |FROM lineitem WHERE l_orderkey % 4 = 1
        |UNION ALL
        |SELECT CAST(3 AS INT), 'delete',
        |  COUNT(*), CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |FROM lineitem WHERE l_orderkey % 20 = 0
        |ORDER BY _commit_version, _change_type""".stripMargin
  )

  /** Time travel through the SQL face, oracle-gated: build
    * write(v1: orders ≡0 mod 4) → append(v2: +≡1) → MOR delete
    * (v3: −(≡0 mod 20)), then read v1, v2 and the head BY VERSION
    * OPTION and aggregate each — the oracle reconstructs all three
    * states as WHERE clauses over the raw parquet, so a version
    * resolving to the wrong file list (or DVs leaking across
    * versions) breaks the hash, not just a spec.
    */
  private def lakeTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val tbl = s"/tmp/graft_lake_tt/${new java.io.File(dir).getName}"
    val p = new org.apache.hadoop.fs.Path(tbl)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ManifestLog.write(li.filter(col("l_orderkey") % 4 === 0), "l_orderkey", tbl, files = 4)
    ManifestLog.append(li.filter(col("l_orderkey") % 4 === 1), "l_orderkey", tbl, files = 2)
    ManifestLog.deleteMor(
      li.filter(col("l_orderkey") % 20 === 0).select("l_orderkey").distinct(),
      "l_orderkey", tbl)
    def agg(tag: String, versionAsOf: Int) =
      ManifestBatchSource.read(spark, tbl, versionAsOf = versionAsOf)
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(lit(tag).as("v_tag"), col("n"), col("qty"))
    agg("v1", 1).unionByName(agg("v2", 2)).unionByName(agg("v3_head", -1))
      .orderBy("v_tag")
  }

  /** CDC through the SQL face, oracle-gated: build write(v1: orders
    * ≡0 mod 4) → append(v2: +≡1) → MOR delete (v3: −(≡0 mod 20)),
    * then read the WHOLE feed from table creation
    * (`readChangeFeed` + `startingVersion = 1` — v1 arrives as
    * bootstrap inserts) and aggregate per (_commit_version,
    * _change_type). The oracle reconstructs each version's change set
    * as a WHERE clause over the raw parquet, so a feed that
    * mis-attributes a version, loses a tombstone, or double-counts a
    * carried file breaks the hash. Scale shape: each version costs
    * only its CHANGED (file, dv) pairs — the v2 diff never re-reads
    * v1's files, the v3 diff reads only the repointed files.
    */
  private def lakeChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val tbl = s"/tmp/graft_lake_cdf/${new java.io.File(dir).getName}"
    val p = new org.apache.hadoop.fs.Path(tbl)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ManifestLog.write(li.filter(col("l_orderkey") % 4 === 0), "l_orderkey", tbl, files = 4)
    ManifestLog.append(li.filter(col("l_orderkey") % 4 === 1), "l_orderkey", tbl, files = 2)
    ManifestLog.deleteMor(
      li.filter(col("l_orderkey") % 20 === 0).select("l_orderkey").distinct(),
      "l_orderkey", tbl)
    ManifestBatchSource.readChangeFeed(spark, tbl, startingVersion = 1)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy("_commit_version", "_change_type")
  }

  private def lakeSqlRead(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    // a fixed per-sf location, rebuilt from scratch for determinism
    val tbl = s"/tmp/graft_lake_sql/${new java.io.File(dir).getName}"
    val p = new org.apache.hadoop.fs.Path(tbl)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ManifestLog.write(li, "l_orderkey", tbl, files = 4)
    ManifestLog.deleteMor(
      li.filter(col("l_orderkey") % 10 === 3).select("l_orderkey").distinct(),
      "l_orderkey", tbl)
    ManifestBatchSource.read(spark, tbl).createOrReplaceTempView("graft_lake_t")
    spark.sql(
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       SUM(CAST(l_quantity AS BIGINT)) AS qty
        |FROM graft_lake_t
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }
}
