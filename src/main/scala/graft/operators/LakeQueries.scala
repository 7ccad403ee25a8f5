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
    "lake_sql_read" -> ((s, dir) => lakeSqlRead(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "lake_sql_read" ->
      """SELECT l_returnflag,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey % 10 <> 3
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )

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
