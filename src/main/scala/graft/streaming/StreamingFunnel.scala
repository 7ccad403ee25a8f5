package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A user's current funnel progress: `stage_us(i)` is the timestamp
  * that completed stage i (-1 = not reached), stamped with the state
  * version so a sink reader can isolate the latest row per user.
  */
final case class FunnelUpdate(user_id: Long, stage_us: Seq[Long], version: Long)

/** Streaming arm of the funnel query (`ev_funnel`): per-user
  * sequential stage matching as a `flatMapGroupsWithState` state
  * machine. State per user is ONE timestamp per funnel stage — fixed
  * size regardless of stream length (the 100-TB shape: a billion
  * users is a billion small state rows, partitioned by user).
  *
  * Matching rule = the batch query's, greedily: stage i completes at
  * the FIRST event of its type at/after stage i-1's completion time.
  * When events arrive in event-time order per user this equals the
  * batch chain of `min(ts) >= prev` aggregations exactly (first
  * qualifying = min qualifying), which is what the differential pins;
  * within a micro-batch arrivals are sorted by (ts, event_id) so
  * shuffle interleaving never reorders the fold. Cross-batch order is
  * the source's contract — same requirement as the incremental-dedup
  * arm's doc-id order.
  *
  * `events` needs (user_id, event_type, ts_us, event_id).
  */
object StreamingFunnel {

  def funnelStream(events: DataFrame,
                   stages: Seq[String] = Seq("signup", "view", "purchase")): Dataset[FunnelUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val nStages = stages.size
    val stageIdx = stages.zipWithIndex.toMap
    val typed = events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("ts_us").cast("long"), col("event_id").cast("long"))
      .as[(Long, String, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[Long], Long), FunnelUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[(Seq[Long], Long)]) =>
          var (st, ver) = state.getOption.getOrElse((Seq.fill(nStages)(-1L), 0L))
          val arr = st.toArray
          var changed = false
          // deterministic in-batch fold order no matter how the
          // shuffle interleaved arrivals
          rows.toIndexedSeq.sortBy(r => (r._3, r._4)).foreach { case (_, et, ts, _) =>
            val i = stageIdx(et)
            val prevDone = i == 0 || arr(i - 1) >= 0L
            val prevTs = if (i == 0) Long.MinValue else arr(i - 1)
            if (arr(i) < 0L && prevDone && ts >= prevTs) {
              arr(i) = ts; changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            ver += 1
            state.update((arr.toSeq, ver))
            Iterator(FunnelUpdate(user, arr.toSeq, ver))
          }
      }
  }
}
