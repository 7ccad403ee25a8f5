package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HeavyHittersAgg

/** A group's current Misra-Gries summary row: token with its
  * summary count, stamped with the state version (update count) so a
  * sink reader can isolate the LATEST summary per group.
  */
final case class HHUpdate(group: String, token: String, approx_cnt: Long, version: Long)

/** Streaming arm of the Misra-Gries heavy-hitters summary
  * ([[HeavyHittersAgg]]): per-group state IS the summary map (≤ k
  * entries — fixed-size state regardless of stream length), each
  * micro-batch folds its tokens through the same sequential MG
  * `reduce`, and every update emits the whole summary stamped with a
  * version counter. The MG guarantees survive streaming verbatim —
  * the fold over (state, micro-batch tokens) is exactly sequential MG
  * over the concatenated arrival order: counts never overestimate the
  * true frequency, undercount by at most n/(k+1), and every token
  * above that threshold is present (StreamingHeavyHittersSpec gates
  * all three after chopping the corpus into micro-batches).
  */
object StreamingHeavyHitters {

  def topTokensStream(stream: DataFrame, k: Int): Dataset[HHUpdate] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val agg = new HeavyHittersAgg(k)
    stream.selectExpr("CAST(group AS STRING) AS _1", "CAST(token AS STRING) AS _2")
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Map[String, Long], Long), HHUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group, rows, state: GroupState[(Map[String, Long], Long)]) =>
          var (summary, version) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          rows.foreach { case (_, tok) => summary = agg.reduce(summary, tok) }
          version += 1
          state.update((summary, version))
          summary.iterator.map { case (t, c) => HHUpdate(group, t, c, version) }
      }
  }
}
