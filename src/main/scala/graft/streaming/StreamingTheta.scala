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
  * group up front (kilobytes, broadcast — the stream never rescans the
  * corpus); each micro-batch folds its values into a per-group state
  * sketch via a theta Union, and every update emits (stream, union,
  * overlap) estimates against the index.
  *
  * Exactness contract: theta sketches retain the k smallest hashes
  * under a fixed seed, so the state is deterministic in the arrived
  * SET — chopping, shuffle, and merge order all irrelevant — and
  * below ~k distinct values per group the estimates are EXACT, which
  * is what the StreamingThetaSpec differential pins against the batch
  * operators. State is one ≤ ~32 KB compact sketch per group
  * regardless of stream length.
  */
object StreamingTheta {

  def overlapStream(corpus: DataFrame, stream: DataFrame,
                    group: String, value: String): Dataset[ThetaEstimate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val idx: Map[String, Array[Byte]] =
      ThetaOps.groupSketches(corpus, group, col(value))
    val bIdx = spark.sparkContext.broadcast(idx)
    stream.select(col(group).cast("string").as("_1"), col(value).cast("long").as("_2"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], ThetaEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Byte]]) =>
          val fresh = UpdateSketch.builder()
            .setNominalEntries(ThetaOps.NominalEntries).build()
          rows.foreach { case (_, v) => fresh.update(v) }
          val merged = state.getOption match {
            case Some(prev) =>
              val u = SetOperation.builder()
                .setNominalEntries(ThetaOps.NominalEntries).buildUnion()
              u.union(ThetaOps.heapify(prev))
              u.union(fresh.compact())
              u.getResult.toByteArray
            case None => fresh.compact().toByteArray
          }
          state.update(merged)
          val (un, ov) = bIdx.value.get(key) match {
            case Some(ib) => (ThetaOps.unionEstimate(merged, ib),
              ThetaOps.intersectionEstimate(merged, ib))
            case None => (ThetaOps.estimate(merged), 0L)
          }
          Iterator(ThetaEstimate(key, ThetaOps.estimate(merged), un, ov))
      }
  }
}
