package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.CmsOps

/** One maintained count-min cell after a micro-batch: the running
  * total of stream items that hashed to (d, cell) within `group`.
  */
final case class CmsCell(group: String, d: Int, cell: Int, cnt: Long)

/** Streaming arm of the count-min sketch ([[graft.operators.CmsOps]]):
  * each group (a language shard, a source) keeps its whole sketch —
  * Depth×Width longs, 32 KB — as `flatMapGroupsWithState` state, folds
  * every micro-batch's tokens in, and emits the updated value of each
  * cell the batch TOUCHED. Cells only change when touched, so the
  * last emission per (group, d, cell) IS its final total: a
  * downstream consumer (or the differential spec) reconstructs the
  * exact batch-built sketch from the update stream, independent of
  * how the stream was chopped into micro-batches.
  *
  * State is bounded by sketch geometry alone — stream length,
  * vocabulary size and skew never grow it — which is the whole point
  * of maintaining a sketch instead of per-token counts at ingest
  * time. The cell function is the same portable md5-prefix hash as
  * the batch/oracle forms ([[CmsOps.cellOf]]), so the differential
  * demands EXACT equality, not a tolerance.
  */
object StreamingCms {

  def cmsCells(stream: DataFrame, group: String, tok: String): Dataset[CmsCell] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col(group).cast("string").as("_1"), col(tok).cast("string").as("_2"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], CmsCell](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Long]]) =>
          val arr = state.getOption.getOrElse(
            new Array[Long](CmsOps.Depth * CmsOps.Width))
          val touched = scala.collection.mutable.SortedSet.empty[Int]
          rows.foreach { case (_, t) =>
            var d = 0
            while (d < CmsOps.Depth) {
              val i = d * CmsOps.Width + CmsOps.cellOf(d, t)
              arr(i) += 1
              touched += i
              d += 1
            }
          }
          state.update(arr)
          touched.iterator.map(i =>
            CmsCell(key, i / CmsOps.Width, i % CmsOps.Width, arr(i)))
      }
  }
}
