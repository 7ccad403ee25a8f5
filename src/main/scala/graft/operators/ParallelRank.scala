package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-key `row_number`: the two-level rank that replaces
  * `Window.partitionBy(key).orderBy(...)` when the KEY CARDINALITY is
  * small (a handful of event names over billions of rows). A plain
  * window clusters each key onto ONE task, capping the stage at
  * #distinct-keys parallelism no matter the cluster size — the
  * classic low-cardinality window scale killer. Here the rank is
  * assembled from pieces every core can compute:
  *
  *   1. segment rows by a DETERMINISTIC bucket of the leading order
  *      column (a timestamp in every caller): bucket = floor((t - lo)
  *      / stride), stride sized off a one-column min/max pre-pass to
  *      ~8 buckets per shuffle partition. Monotone in the order, and —
  *      unlike `spark_partition_id` over a range exchange — identical
  *      on every traversal of the plan (a nondeterministic partition
  *      id evaluated once for the rank pass and once for the count
  *      pass silently disagrees, mis-shifting whole partitions);
  *   2. rank LOCALLY per (key, bucket) — parallelism grows with the
  *      timeline, not the key count; ties in the leading column land
  *      in one bucket by construction, and `orderCols` carries a
  *      unique tiebreaker for a total order within it;
  *   3. per-(key, bucket) row counts — a tiny aggregate — prefix-
  *      summed per key in bucket order and broadcast back:
  *      global rank = local rank + offset.
  *
  * Output is IDENTICAL to the single-task window (row_number is a
  * function of the total order alone, not of partition boundaries),
  * so oracle-checked queries can swap freely. Degenerate cases stay
  * correct, just not parallel: a constant order column (all rows one
  * bucket) reproduces the plain window's behavior.
  */
object ParallelRank {

  /** Below this input size the plain single-task-per-key window wins:
    * its one pass beats the segmented plan's three (stats, counts,
    * rank), and half a million rows sort on one core in well under a
    * second. Size-adaptive plan choice, same spirit as Spark's
    * broadcast-vs-sort-merge threshold — at 100 TB nothing is small
    * and the extra narrow passes amortize to noise.
    */
  val SmallInputRows: Long = 512L * 1024

  /** Effective cutover: an explicit non-negative argument wins, then
    * the session conf `graft.window.smallInputRows` (the deployment
    * knob — and how plan-shape specs force the segmented path on
    * small fixtures), then [[SmallInputRows]].
    */
  def resolveThreshold(df: DataFrame, smallThreshold: Long): Long =
    if (smallThreshold >= 0) smallThreshold
    else df.sparkSession.conf.getOption("graft.window.smallInputRows")
      .map(_.toLong).getOrElse(SmallInputRows)

  /** Append 1-based global `row_number() over (partition by keyCols
    * order by orderCols)` as column `out`. `orderCols.head` must be
    * numeric (it seeds the bucket function) and `orderCols` must
    * reach a total order (include a unique tiebreaker).
    */
  def withRowNumber(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                    out: String, smallThreshold: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ord0 = orderCols.head
    val mm = df.agg(min(ord0).cast("double").as("lo"), max(ord0).cast("double").as("hi"),
      count(lit(1)).as("n")).head()
    if (mm.isNullAt(0)) return df.withColumn(out, lit(1L)) // empty input
    if (mm.getLong(2) <= resolveThreshold(df, smallThreshold)) {
      val w =
        if (keyCols.isEmpty) Window.orderBy(orderCols: _*)
        else Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      return df.withColumn(out, row_number().over(w).cast("long"))
    }
    val lo = mm.getDouble(0)
    val stride = math.max(math.ulp(lo), (mm.getDouble(1) - lo) / (p * 8).toDouble)

    val keyNames = keyCols.indices.map(i => s"__prk$i")
    val bucketed = keyCols.zip(keyNames).foldLeft(df) { case (d, (c, n)) =>
        d.withColumn(n, c)
      }
      .withColumn("__prbkt",
        floor((ord0.cast("double") - lit(lo)) / lit(stride)).cast("long"))
    val keyB = keyNames.map(col) :+ col("__prbkt")
    val local = bucketed.withColumn("__prlrn",
      row_number().over(Window.partitionBy(keyB: _*).orderBy(orderCols: _*)).cast("long"))
    // tiny: one row per (key, bucket); the cumulative sum runs per key
    // over the bucket count
    val offs = bucketed.groupBy(keyB: _*)
      .agg(count(lit(1)).as("__prcnt"))
      .withColumn("__proff",
        coalesce(sum(col("__prcnt")).over(
          Window.partitionBy(keyNames.map(col): _*).orderBy(col("__prbkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__prcnt")
    local
      .join(broadcast(offs), (keyNames :+ "__prbkt").toSeq)
      .withColumn(out, col("__prlrn") + col("__proff"))
      .drop((Seq("__prbkt", "__prlrn", "__proff") ++ keyNames): _*)
  }

  /** Append the 1-based-inclusive running `sum(value) over (partition
    * by keyCols order by orderCols rows between unbounded preceding
    * and current row)` as column `out` — the distributed prefix sum
    * behind sequence packing and token-budget draws, where the "key"
    * is a source/shard name with a handful of distinct values and a
    * plain window caps the whole corpus at #shards parallelism.
    *
    * Same segmentation as [[withRowNumber]]: deterministic monotone
    * buckets of the leading order column, a LOCAL running sum per
    * (key, bucket), and a broadcast per-(key, bucket) prefix-total
    * table (`sum(value)` per bucket, prefix-summed per key in bucket
    * order): global running sum = local running sum + bucket offset.
    * Exact for any associative numeric `value` type Spark's `sum`
    * handles (long stays long, no float reordering for integers —
    * the token-count callers). Identical to the single-task window
    * (a ROWS running sum is a function of the total order alone).
    */
  def withRunningSum(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                     value: Column, out: String, smallThreshold: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ord0 = orderCols.head
    val mm = df.agg(min(ord0).cast("double").as("lo"), max(ord0).cast("double").as("hi"),
      count(lit(1)).as("n")).head()
    if (mm.isNullAt(0)) return df.withColumn(out, value) // empty/degenerate input
    val plainW = {
      val base =
        if (keyCols.isEmpty) Window.orderBy(orderCols: _*)
        else Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
      base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    if (mm.getLong(2) <= resolveThreshold(df, smallThreshold))
      return df.withColumn(out, sum(value).over(plainW))
    val lo = mm.getDouble(0)
    val stride = math.max(math.ulp(lo), (mm.getDouble(1) - lo) / (p * 8).toDouble)

    val keyNames = keyCols.indices.map(i => s"__psk$i")
    val bucketed = keyCols.zip(keyNames).foldLeft(df) { case (d, (c, n)) =>
        d.withColumn(n, c)
      }
      .withColumn("__psv", value)
      .withColumn("__psbkt",
        floor((ord0.cast("double") - lit(lo)) / lit(stride)).cast("long"))
    val keyB = keyNames.map(col) :+ col("__psbkt")
    val local = bucketed.withColumn("__pslcs",
      sum(col("__psv")).over(Window.partitionBy(keyB: _*).orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = bucketed.groupBy(keyB: _*)
      .agg(sum(col("__psv")).as("__pssum"))
      .withColumn("__psoff",
        coalesce(sum(col("__pssum")).over(
          Window.partitionBy(keyNames.map(col): _*).orderBy(col("__psbkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__pssum")
    local
      .join(broadcast(offs), (keyNames :+ "__psbkt").toSeq)
      .withColumn(out, col("__pslcs") + col("__psoff"))
      .drop((Seq("__psbkt", "__psv", "__pslcs", "__psoff") ++ keyNames): _*)
  }

  /** Keep each key's global top-`k` rows by `orderCols` and append
    * their exact 1-based rank as `out` — the distributed per-key
    * top-k that replaces `row_number().over(partitionBy(key)).filter
    * (<= k)` when the key cardinality is small (25 nations over a
    * billion suppliers: a plain window sorts 1/25th of the table on
    * ONE task). Two exact levels:
    *
    *   1. rank per (key, `salt`) — `salt` must be a DETERMINISTIC
    *      per-row column (hash a unique id); any row in the key's
    *      global top-k is top-k within its own salt bucket, so the
    *      local `<= k` filter never drops a global survivor;
    *   2. a plain per-key window over the ≤ saltBuckets·k survivors
    *      assigns the exact global rank; the final filter keeps `k`.
    *
    * The salt is plan-internal — output equals the single-window
    * query. Parallelism of the heavy first level is #keys × salt
    * buckets (sized 2× the shuffle partition count).
    */
  def withTopKRank(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                   k: Int, salt: Column, out: String,
                   smallThreshold: Long = -1L,
                   precomputedCount: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val plainW =
      if (keyCols.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    // `precomputedCount` (e.g. Tables.cachedCount) skips the eager
    // count job the cutover decision otherwise pays on every call.
    val n = if (precomputedCount >= 0) precomputedCount else df.count()
    if (n <= resolveThreshold(df, smallThreshold))
      return df.withColumn(out, row_number().over(plainW).cast("long"))
        .filter(col(out) <= k)
    val buckets = spark.sessionState.conf.numShufflePartitions * 2
    val keyNames = keyCols.indices.map(i => s"__ptk$i")
    val salted = keyCols.zip(keyNames).foldLeft(df) { case (d, (c, nm)) =>
        d.withColumn(nm, c)
      }
      .withColumn("__ptsalt", pmod(salt, lit(buckets.toLong)))
    val saltedKeys = keyNames.map(col) :+ col("__ptsalt")
    val survivors = salted
      .withColumn("__ptlrn",
        row_number().over(Window.partitionBy(saltedKeys: _*).orderBy(orderCols: _*)))
      .filter(col("__ptlrn") <= k)
    val globalW =
      if (keyNames.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(keyNames.map(col): _*).orderBy(orderCols: _*)
    survivors
      .withColumn(out, row_number().over(globalW).cast("long"))
      .filter(col(out) <= k)
      .drop((Seq("__ptsalt", "__ptlrn") ++ keyNames): _*)
  }
}
