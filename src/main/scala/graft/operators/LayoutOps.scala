package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout utilities for the 100-TB shapes SURVEY §2.6 claims:
  * bucketed tables make repeated equi-joins and aggregations on the
  * bucket key EXCHANGE-FREE — the shuffle is paid once at write time,
  * then every co-bucketed join reads matching buckets side by side.
  *
  * This matters exactly at the scale this engine targets: a fact
  * table joined nightly against the same dimension key re-shuffles
  * 100 TB every run unless the layout carries the partitioning.
  * Spark's bucketing (hash(key) mod n file groups + a sorted-by-key
  * file order) is the storage-level contract Catalyst recognizes —
  * `FileSourceScanExec` reports the bucket distribution, and the
  * planner drops both the Exchange and (with `sortBy`) the per-task
  * Sort under a SortMergeJoin. LayoutOpsSpec asserts the
  * exchange-free plan and row-for-row parity with the unbucketed
  * join.
  */
object LayoutOps {

  /** Write `df` as a bucketed, bucket-sorted managed table at `path`.
    * `buckets` should match across tables meant to co-join (Spark
    * requires equal bucket counts — or a multiple with
    * `spark.sql.bucketing.coalesceBucketsInJoin.enabled` — to elide
    * the exchange).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — reads resolve
    * through the catalog so the bucket spec is visible to the planner.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
