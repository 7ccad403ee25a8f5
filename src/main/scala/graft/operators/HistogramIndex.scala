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
  def percentileFromCounts(counts0: DataFrame, g: String, p: Double,
                           out: String): DataFrame = {
    // The counts frame is SKETCH-sized ((group, distinct value) rows,
    // bounded by the measure's domain, never the corpus) but its
    // upstream usually is corpus-sized — and it is referenced by the
    // running sum (plan + its eager stats pass), the per-group totals,
    // and the bracketing pass below. Without a persist each reference
    // re-evaluates the whole upstream (ev_rate_anomaly's static plan
    // carried 50 copies of the events scan); with it the upstream runs
    // once and every later pass reads cached sketch rows.
    val counts = counts0.persist()
    val cum = ParallelRank.withRunningSum(counts, Seq(col(g)),
      Seq(col("__pv")), col("__pc"), "__cum")
    val sizes = counts.groupBy(col(g)).agg(sum("__pc").as("__n"))
    val withR = cum.join(broadcast(sizes), g)
      .withColumn("__r", lit(p) * (col("__n") - 1))
      .withColumn("__k0", floor(col("__r")) + 1)
      .withColumn("__k1", least(floor(col("__r")) + 2, col("__n")))
    // Both bracketing order statistics in ONE pass over the running
    // sums: each hit predicate selects exactly one row per group (the
    // value whose cumulative range covers k), so the conditional max
    // IS that value — same rows the former v0/v1 filter+self-join
    // selected, one evaluation of the withR tree instead of two and
    // no join. __r is constant per group (p·(n−1)), max picks it.
    val hit0 = col("__cum") >= col("__k0") && col("__cum") - col("__pc") < col("__k0")
    val hit1 = col("__cum") >= col("__k1") && col("__cum") - col("__pc") < col("__k1")
    withR.filter(hit0 || hit1)
      .groupBy(col(g))
      .agg(max(when(hit0, col("__pv"))).as("__v0"),
        max(when(hit1, col("__pv"))).as("__v1"),
        max(col("__r")).as("__r"))
      .select(col(g),
        when(col("__r") === floor(col("__r")), col("__v0"))
          .otherwise((ceil(col("__r")) - col("__r")) * col("__v0") +
            (col("__r") - floor(col("__r"))) * col("__v1"))
          .as(out))
  }
}
