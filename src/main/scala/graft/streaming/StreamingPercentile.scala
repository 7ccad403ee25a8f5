package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A group's current exact percentile over corpus-index ∪ everything
  * streamed so far, stamped with the state version.
  */
final case class PctUpdate(group: String, pct: Double, version: Long)

/** Streaming arm of the value-histogram percentile index
  * ([[graft.operators.HistogramIndex]]): per-group state is the
  * (value → count) histogram — bounded by the measure's DISTINCT
  * values, the same compression contract as the batch index — seeded
  * from the persisted per-shard index as `flatMapGroupsWithState`
  * INITIAL STATE (the index collapses per group on executors and is
  * shuffled straight into the state store — the driver never
  * materializes it, so driver memory is O(1) no matter how many
  * groups or distinct values the index holds), folded forward by
  * counting each micro-batch's values, and re-interpolated on every
  * update with the exact weighted order-statistics arithmetic the
  * batch path uses. Counts merge by summation, so the final streamed
  * percentile is BIT-IDENTICAL to the batch `percentileWithBatch`
  * over the same rows under any micro-batch chopping
  * (StreamingPercentileSpec pins equality, not a tolerance), and the
  * state store carries the histograms across kill/restart
  * (StreamingRestartSpec) — on restart the recovered store wins and
  * the initial state is ignored, exactly Spark's contract. Initial
  * state is applied for EVERY index group at batch 0 — Spark invokes
  * the function with an empty row iterator for keys that have initial
  * state but no batch-0 data, and the seeded state is checkpointed —
  * so a group whose first arrival lands only after a kill/restart
  * still builds on its seed (StreamingRestartSpec pins the
  * late-first-seen case: median over seed ∪ post-restart arrivals,
  * never arrivals alone).
  */
object StreamingPercentile {

  /** The shared interpolation arithmetic on a materialized histogram:
    * r = p·(n−1), bracketing order statistics k0/k1, and the WEIGHTED
    * form (⌈r⌉−r)·v0 + (r−⌊r⌋)·v1 — identical IEEE ops to
    * HistogramIndex.percentileFromCounts (and `percentile` /
    * `quantile_cont`).
    */
  def interpolate(hist: Map[Double, Long], p: Double): Double = {
    val sorted = hist.toArray.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    val r = p * (n - 1)
    val k0 = math.floor(r).toLong + 1
    val k1 = math.min(k0 + 1, n)
    def orderStat(k: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= k) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
    val v0 = orderStat(k0)
    if (r == math.floor(r)) v0
    else (math.ceil(r) - r) * v0 + (r - math.floor(r)) * orderStat(k1)
  }

  /** `index` must carry (group, value, cnt) — the
    * [[graft.operators.HistogramIndex.buildValueHistIndex]] artifact
    * (shards collapse here); `stream` must carry (group, value).
    */
  def percentileStream(index: DataFrame, stream: DataFrame, group: String,
                       value: String, p: Double): Dataset[PctUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // One state row per group, assembled ON EXECUTORS: collapse the
    // sharded index with a sum-agg (map-side partial), then fold each
    // group's (value, cnt) rows into the histogram map. Handing this
    // KeyValueGroupedDataset to flatMapGroupsWithState shuffles it
    // co-partitioned with the stream and loads it into the state
    // store at batch 0 — no collect(), no broadcast.
    val initState = index
      .groupBy(col(group).cast("string").as("g"), col("value").cast("double").as("v"))
      .agg(sum("cnt").as("c"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapGroups { (g, rows) =>
        (g, (rows.map(r => r._2 -> r._3).toMap, 0L))
      }
      .groupByKey(_._1)
      .mapValues(_._2)
    stream.select(col(group).cast("string").as("_1"), col(value).cast("double").as("_2"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Map[Double, Long], Long), PctUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initState) {
        (key, rows, state: GroupState[(Map[Double, Long], Long)]) =>
          var (hist, version) = state.getOption
            .getOrElse((Map.empty[Double, Long], 0L))
          rows.foreach { case (_, v) => hist = hist.updated(v, hist.getOrElse(v, 0L) + 1L) }
          version += 1
          state.update((hist, version))
          if (hist.isEmpty) Iterator.empty
          else Iterator(PctUpdate(key, interpolate(hist, p), version))
      }
  }
}
