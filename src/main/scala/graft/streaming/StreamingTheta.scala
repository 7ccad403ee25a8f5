package graft.streaming

import org.apache.datasketches.theta.{SetOperation, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.ThetaOps

/** A group's running population estimates over the stream so far vs a
  * persisted corpus index: distinct arrivals, distinct union with the
  * corpus, and — the part HLL cannot answer — the distinct OVERLAP
  * (how much of the arriving population is already known).
  */
final case class ThetaEstimate(group: String, est_stream: Long,
                               est_union: Long, est_overlap: Long)

/** Streaming arm of the theta-sketch population overlap
  * ([[graft.operators.ThetaOps]]): the ingestion-time view of "how
  * much of this group's arriving traffic is already-known
  * population". The static corpus collapses to ONE compact sketch per
  * group ON EXECUTORS ([[ThetaOps.groupSketchesDs]] — per-partition
  * partials, per-group union) and loads into the state store as
  * `flatMapGroupsWithState` INITIAL STATE, the StreamingPercentile
  * discipline: no collect(), no broadcast, driver memory O(1) in the
  * group count. The state is (corpus sketch, stream sketch); each
  * micro-batch folds its values into the stream half via a theta
  * Union, and every update emits (stream, union, overlap) estimates
  * against the carried corpus half — the identical set algebra the
  * broadcast formulation ran.
  *
  * Exactness contract: theta sketches retain the k smallest hashes
  * under a fixed seed, so the state is deterministic in the arrived
  * SET — chopping, shuffle, and merge order all irrelevant — and
  * below ~k distinct values per group the estimates are EXACT, which
  * is what the StreamingThetaSpec differential pins against the batch
  * operators. State is two ≤ ~32 KB compact sketches per group
  * regardless of stream length. Initial state is written for EVERY
  * corpus group at batch 0 whether or not it has batch-0 data, so the
  * index survives restart for groups first seen afterwards
  * (StreamingRestartSpec pins the late-first-seen case for the HLL
  * twin; the mechanism is the same operator).
  */
object StreamingTheta {

  private def emptyCompact: Array[Byte] =
    UpdateSketch.builder().setNominalEntries(ThetaOps.NominalEntries)
      .build().compact().toByteArray

  def overlapStream(corpus: DataFrame, stream: DataFrame,
                    group: String, value: String): Dataset[ThetaEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val initState = ThetaOps.groupSketchesDs(corpus, group, col(value))
      .map { case (g, sk) => (g, (Option(sk), emptyCompact)) }
      .groupByKey(_._1)
      .mapValues(_._2)
    stream.select(col(group).cast("string").as("_1"), col(value).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Option[Array[Byte]], Array[Byte]), ThetaEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initState) {
        (key, rows, state: GroupState[(Option[Array[Byte]], Array[Byte])]) =>
          val (idxOpt, prev) = state.getOption
            .getOrElse((None: Option[Array[Byte]], emptyCompact))
          val fresh = UpdateSketch.builder()
            .setNominalEntries(ThetaOps.NominalEntries).build()
          rows.foreach { case (_, v) => fresh.update(v) }
          val u = SetOperation.builder()
            .setNominalEntries(ThetaOps.NominalEntries).buildUnion()
          u.union(ThetaOps.heapify(prev))
          u.union(fresh.compact())
          val merged = u.getResult.toByteArray
          state.update((idxOpt, merged))
          val (un, ov) = idxOpt match {
            case Some(ib) => (ThetaOps.unionEstimate(merged, ib),
              ThetaOps.intersectionEstimate(merged, ib))
            case None => (ThetaOps.estimate(merged), 0L)
          }
          Iterator(ThetaEstimate(key, ThetaOps.estimate(merged), un, ov))
      }
  }
}
