package graft.streaming

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A group's running distinct-count estimate over corpus-index ∪
  * everything streamed so far.
  */
final case class GroupEstimate(group: String, est_distinct: Long)

/** Streaming arm of the HLL distinct-count index
  * ([[graft.operators.SketchIndex]]): the ingestion-time view of
  * "distinct users per group including everything that has arrived".
  * The persisted per-shard index collapses to ONE sketch per group up
  * front (kilobytes — broadcast, like the stream-static index joins);
  * each micro-batch folds its values into a per-group state sketch
  * (`flatMapGroupsWithState`), and every update emits the union of
  * state ∪ index — no corpus rescan, state bounded at one ~2 KB sketch
  * per group regardless of stream length.
  *
  * Exactness contract: the library under Spark's `hll_sketch_agg` is
  * the same DataSketches HLL (lgK 12, HLL_8 target — mirrored here),
  * registers are per-register maxes, so after any micro-batch chopping
  * the latest estimate per group EQUALS the batch
  * `SketchIndex.estimateWithBatch` over the same rows — the
  * StreamingSketchSpec differential pins it id-for-id.
  */
object StreamingSketch {

  /** Spark's hll_sketch_agg defaults, mirrored. */
  private val LgK = 12

  def estimateStream(index: DataFrame, stream: DataFrame,
                     group: String, value: String): Dataset[GroupEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // one unioned sketch per group from the persisted index — the
    // only look the stream ever takes at the corpus
    val idx: Map[String, Array[Byte]] = index
      .groupBy(col(group).cast("string").as("g"))
      .agg(hll_union_agg(col("sketch")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val bIdx = spark.sparkContext.broadcast(idx)
    stream.select(col(group).cast("string").as("_1"), col(value).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], GroupEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Byte]]) =>
          val sk = state.getOption
            .map(b => HllSketch.heapify(b))
            .getOrElse(new HllSketch(LgK, TgtHllType.HLL_8))
          rows.foreach { case (_, v) => sk.update(v) }
          state.update(sk.toUpdatableByteArray)
          val u = new Union(LgK)
          u.update(sk)
          bIdx.value.get(key).foreach(b => u.update(HllSketch.heapify(b)))
          // Math.round, matching hll_sketch_estimate's long rendering
          Iterator(GroupEstimate(key,
            Math.round(u.getResult(TgtHllType.HLL_8).getEstimate)))
      }
  }
}
