package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental distinct-count index: per-shard DataSketches HLL
  * sketches persisted as a parquet artifact, so a growing corpus
  * answers "distinct users per group, including today's batch" by
  * UNIONING fixed-size sketches instead of rescanning rows — the
  * aggregate-level sibling of the `dedup_incremental` hash/MinHash
  * indexes (TextQueries) and the shape that admits a daily crawl
  * against a 100-TB corpus: the daily job appends one sketch row per
  * (group, shard), the query side reads ~(groups × shards) KILOBYTES.
  *
  * HLL register state is a per-register MAX over hashed inputs, so
  * sketches are insertion-order- and partition-independent and union
  * is associative/commutative/idempotent — re-ingesting an
  * overlapping shard never double-counts, the property plain
  * per-shard COUNT DISTINCT sums lack. The union-of-shards ESTIMATE,
  * though, equals the one-shot whole-corpus estimate exactly only
  * while the sketch stays in coupon (LIST/SET) mode: once dense, a
  * streamed sketch uses DataSketches' HIP estimator while a
  * union-merged one is out-of-order and uses the composite estimator,
  * so identical registers read a fraction of a percent apart (first
  * observed running the Verify gate at sf0.1). IncrementalSketchSpec
  * pins coupon-mode exactness at its scale; the driver invariant
  * bounds the dense-mode estimator gap at 1%.
  *
  * Reference scope: cdp has no sketch aggregates (its dedup is exact
  * per-window, reference src/step-functions.ts); this extends the
  * §2.6 relational battery the way `agg_approx_distinct` does, per
  * the training-data-pipeline mandate.
  */
object SketchIndex {

  /** Per-(group, shard) HLL sketches of `value`. The output is the
    * persistable index artifact: one binary sketch column, a few KB
    * per row, mergeable forever after.
    */
  def buildDistinctIndex(df: DataFrame, group: Seq[String], shard: Column,
                         value: Column): DataFrame =
    df.groupBy((group.map(col) :+ shard.as("shard")): _*)
      .agg(hll_sketch_agg(value).as("sketch"))

  /** Distinct estimate per group over corpus-index ∪ batch: the batch
    * folds to one sketch per group map-side (hll_sketch_agg partials
    * merge before the shuffle), then a single tiny union-agg over
    * (index rows + batch sketches). Corpus rows are never read.
    */
  def estimateWithBatch(index: DataFrame, batch: DataFrame, group: Seq[String],
                        value: Column): DataFrame = {
    val batchSk = batch.groupBy(group.map(col): _*)
      .agg(hll_sketch_agg(value).as("sketch"))
    index.select((group.map(col) :+ col("sketch")): _*)
      .unionByName(batchSk)
      .groupBy(group.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_distinct"))
  }
}
