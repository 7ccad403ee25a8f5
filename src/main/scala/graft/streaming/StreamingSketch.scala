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
  * The persisted per-shard index collapses to ONE sketch per group ON
  * EXECUTORS (`hll_union_agg`, map-side partial) and loads into the
  * state store as `flatMapGroupsWithState` INITIAL STATE — the
  * StreamingPercentile discipline: no collect(), no broadcast, driver
  * memory O(1) no matter how many groups the index holds. The state is
  * (index sketch, stream sketch): the index half is carried VERBATIM
  * so every update emits exactly the same Union(stream, index)
  * arithmetic as the batch path (folding stream values INTO the index
  * sketch would switch DataSketches from the HIP to the composite
  * estimator and drift the estimate); the stream half folds each
  * micro-batch's values. State stays bounded at two ~2 KB sketches per
  * group regardless of stream length.
  *
  * Exactness contract: the library under Spark's `hll_sketch_agg` is
  * the same DataSketches HLL (lgK 12, HLL_8 target — mirrored here),
  * registers are per-register maxes, so after any micro-batch chopping
  * the latest estimate per group EQUALS the batch
  * `SketchIndex.estimateWithBatch` over the same rows — the
  * StreamingSketchSpec differential pins it id-for-id. Initial state
  * is written to the store for EVERY index group at batch 0, whether
  * or not that group has batch-0 data (StreamingRestartSpec pins a
  * group whose first arrival lands only after a kill/restart), so the
  * seed survives restart for late-first-seen groups too.
  */
object StreamingSketch {

  /** Spark's hll_sketch_agg defaults, mirrored. */
  private val LgK = 12

  private def emptySketch: Array[Byte] =
    new HllSketch(LgK, TgtHllType.HLL_8).toUpdatableByteArray

  def estimateStream(index: DataFrame, stream: DataFrame,
                     group: String, value: String): Dataset[GroupEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // one unioned sketch per group from the persisted index, collapsed
    // on executors and shuffled straight into the state store — the
    // only look the stream ever takes at the corpus
    val initState = index
      .groupBy(col(group).cast("string").as("g"))
      .agg(hll_union_agg(col("sketch")).as("sk"))
      .as[(String, Array[Byte])]
      .map { case (g, sk) => (g, (Option(sk), emptySketch)) }
      .groupByKey(_._1)
      .mapValues(_._2)
    stream.select(col(group).cast("string").as("_1"), col(value).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[Array[Byte]], Array[Byte]), GroupEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initState) {
        (key, rows, state: GroupState[(Option[Array[Byte]], Array[Byte])]) =>
          val (idxOpt, streamBytes) = state.getOption
            .getOrElse((None: Option[Array[Byte]], emptySketch))
          val sk = HllSketch.heapify(streamBytes)
          rows.foreach { case (_, v) => sk.update(v) }
          state.update((idxOpt, sk.toUpdatableByteArray))
          val u = new Union(LgK)
          u.update(sk)
          idxOpt.foreach(b => u.update(HllSketch.heapify(b)))
          // Math.round, matching hll_sketch_estimate's long rendering
          Iterator(GroupEstimate(key,
            Math.round(u.getResult(TgtHllType.HLL_8).getEstimate)))
      }
  }
}
