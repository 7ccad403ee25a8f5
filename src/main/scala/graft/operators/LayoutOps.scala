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

  // ---- Z-order (Morton) layout: multi-column scan pruning. A table
  // range-partitioned and sorted by ONE column prunes scans on that
  // column only; sorting by the interleaved bits of TWO columns keeps
  // each file (and each parquet row group) compact in BOTH value
  // ranges, so min/max stats prune selective predicates on either
  // column — the standard lakehouse layout for a 100-TB fact table
  // queried along more than one axis. Everything below is plain
  // codegen'd Column arithmetic; no UDFs. ----

  /** Spread the low 16 bits of `x` to the even bit positions (the
    * textbook mask-and-shift Morton expansion, 4 steps).
    */
  private def spread16(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    var v = x.cast("long").bitwiseAND(lit(0xFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 32-bit Morton code of two 16-bit bucket ids: a's bits at even
    * positions, b's at odd.
    */
  def morton(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))
  }

  /** Z-value of two numeric columns: each is min/max-scaled to a
    * 16-bit bucket id (one stats pass over both columns), then Morton-
    * interleaved. Monotone enough that a range predicate on either
    * source column maps to compact z ranges.
    */
  def zValue(df: DataFrame, c1: String, c2: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def bucket(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * 65536).cast("long"),
        lit(65535L))
    }
    morton(bucket(c1, r.getDouble(0), r.getDouble(1)),
      bucket(c2, r.getDouble(2), r.getDouble(3)))
  }

  /** Write `df` Z-ordered by `(c1, c2)`: range-partitioned on the
    * z-value into `files` output files, z-sorted within each, small
    * parquet row groups so the reader's min/max pruning has fine
    * granularity. The write pays one range exchange; every later scan
    * with a selective predicate on c1 OR c2 reads a fraction of the
    * row groups (LayoutOpsSpec measures the scan-rows ratio against
    * the same data laid out randomly).
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
                    files: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__z", zValue(df, c1, c2))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(path)
  }

  // ---- File-level zone maps: a MANIFEST of per-file min/max stats.
  // Parquet footers already prune ROW GROUPS, but Spark still lists,
  // opens, and plans a task for every file — at 100 TB (hundreds of
  // thousands of files) the listing and task-scheduling overhead
  // dominates a selective scan. The manifest is the lakehouse
  // data-skipping trick (Delta/Iceberg file stats) on vanilla
  // parquet: a kilobytes-scale sidecar consulted BEFORE Spark ever
  // sees the file list, so a narrow predicate plans only the
  // surviving files. ----

  /** Write `df` range-partitioned on `statsCol` (tight per-file value
    * ranges — the layout that makes zone maps selective) plus a
    * `_manifest` sidecar of per-file (min, max, rows) for `statsCol`,
    * computed from the data actually written.
    */
  def writeWithManifest(df: DataFrame, statsCol: String, path: String,
                        files: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    df.repartitionByRange(files, col(statsCol))
      .sortWithinPartitions(statsCol)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statsCol)).as("lo"), max(col(statsCol)).as("hi"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Scan `path` for `statsCol ∈ [lo, hi]`, consulting the manifest
    * first: only files whose [min, max] intersects the predicate reach
    * Spark's reader (the residual filter still applies — zone maps are
    * a superset prefilter, so results are exactly the plain scan's).
    * Returns the pruned frame plus (surviving, total) file counts so
    * callers can report the skip ratio.
    */
  def readPruned(spark: SparkSession, path: String, statsCol: String,
                 lo: Any, hi: Any): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val manifest = spark.read.parquet(s"$path/_manifest")
      .select("file", "lo", "hi").collect()
    val survivors = manifest.filter(r =>
      !(cmp(r.get(2), lo) < 0 || cmp(r.get(1), hi) > 0)).map(_.getString(0))
    val pruned =
      if (survivors.isEmpty)
        spark.read.parquet(path).filter(col(statsCol) >= lit(lo) && lit(false))
      else spark.read.parquet(survivors.toIndexedSeq: _*)
        .filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
    (pruned, survivors.length, manifest.length)
  }

  /** Ordering across the numeric/orderable types a stats column can
    * carry (manifest values arrive as Any from Row.get).
    */
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)       => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case other => throw new IllegalArgumentException(s"unorderable manifest pair: $other")
  }
}
