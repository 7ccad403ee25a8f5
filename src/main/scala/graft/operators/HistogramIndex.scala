package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental EXACT percentiles over a persisted value-histogram
  * index: per-(group, shard) distinct-value counts written as a
  * parquet artifact, merged with the day's batch by SUMMING counts —
  * exact, deterministic, and mergeable (unlike randomized quantile
  * sketches), so the incremental result is bit-identical to a full
  * recompute and hash-matches a DuckDB `quantile_cont` oracle.
  *
  * The index compresses only as far as the measure's distinct-value
  * count (l_quantity: 50 values/group/shard; a continuous double
  * would degenerate to the data itself) — the right tool for the
  * bounded-domain measures real pipelines track percentiles of
  * (quantities, token counts, latencies bucketed to ms). Scale shape:
  * the probe shuffles (group, value) rows — index rows + batch
  * distinct values, never the corpus rows.
  *
  * Reference scope: cdp has no quantile operator; this extends the
  * §2.6 battery next to `agg_percentile`'s distributed order
  * statistics, whose interpolation arithmetic it reuses verbatim.
  */
object HistogramIndex {

  /** Per-(group, shard) distinct-value counts of `value` — the
    * persistable index artifact.
    */
  def buildValueHistIndex(df: DataFrame, group: Seq[String], shard: Column,
                          value: Column): DataFrame =
    df.groupBy((group.map(col) :+ shard.as("shard")) :+ value.as("value"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Exact interpolated percentile per group over corpus-index ∪
    * batch: counts merge by summation (associative/commutative), then
    * the shared order-statistics interpolation
    * ([[percentileFromCounts]]) — identical arithmetic to
    * `agg_percentile`'s segmented path and DuckDB's `quantile_cont`.
    */
  def percentileWithBatch(index: DataFrame, batch: DataFrame, group: String,
                          value: Column, p: Double, out: String): DataFrame = {
    val batchCounts = batch.groupBy(col(group), value.as("value"))
      .agg(count(lit(1)).as("cnt"))
    val merged = index.select(col(group), col("value"), col("cnt"))
      .unionByName(batchCounts)
      .groupBy(col(group), col("value").as("__pv"))
      .agg(sum("cnt").as("__pc"))
    percentileFromCounts(merged, group, p, out)
  }

  /** Interpolated percentile from per-(group, value) counts — the
    * arithmetic core shared with `RelationalQueries.exactPercentile`:
    * a segmented running count in value order (ParallelRank — the
    * shuffle carries distinct values), bracketing order statistics
    * k0 = ⌊p(n−1)⌋+1 and k1, and the WEIGHTED interpolation
    * (⌈r⌉−r)·v0 + (r−⌊r⌋)·v1 that `percentile` / `quantile_cont`
    * compute (NOT v0 + frac·(v1−v0), which differs by an ulp).
    * `counts` must carry (group, __pv, __pc).
    */
  def percentileFromCounts(counts: DataFrame, g: String, p: Double,
                           out: String): DataFrame = {
    val cum = ParallelRank.withRunningSum(counts, Seq(col(g)),
      Seq(col("__pv")), col("__pc"), "__cum")
    val sizes = counts.groupBy(col(g)).agg(sum("__pc").as("__n"))
    val withR = cum.join(broadcast(sizes), g)
      .withColumn("__r", lit(p) * (col("__n") - 1))
      .withColumn("__k0", floor(col("__r")) + 1)
      .withColumn("__k1", least(floor(col("__r")) + 2, col("__n")))
    val v0 = withR
      .filter(col("__cum") >= col("__k0") && col("__cum") - col("__pc") < col("__k0"))
      .select(col(g), col("__pv").as("__v0"), col("__r"))
    val v1 = withR
      .filter(col("__cum") >= col("__k1") && col("__cum") - col("__pc") < col("__k1"))
      .select(col(g), col("__pv").as("__v1"))
    v0.join(v1, g).select(col(g),
      when(col("__r") === floor(col("__r")), col("__v0"))
        .otherwise((ceil(col("__r")) - col("__r")) * col("__v0") +
          (col("__r") - floor(col("__r"))) * col("__v1"))
        .as(out))
  }
}
