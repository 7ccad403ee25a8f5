package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of a user's stream, in arrival-time order. */
final case class UserEvent(userId: Long, tsUs: Long, eventId: Long,
                           eventType: String)

/** One observed adjacent transition in a user's stream. */
final case class TransitionHit(from_type: String, to_type: String)

/** Streaming Markov-transition observation: the ingestion-time arm of
  * `ev_transitions`. State per user is the LAST event seen (one
  * (ts, id, type) triple), so an adjacent pair that straddles a
  * micro-batch boundary is still emitted — the lead() the batch query
  * computes in one pass becomes a per-user state carry. Rows inside a
  * micro-batch fold in (ts, event_id) order for determinism; with
  * in-order arrival (the same contract the sessionize/funnel/gap arms
  * state) the emitted hit multiset equals the batch lead() pairs under
  * ANY chopping. Downstream, counts/probabilities are one tiny
  * aggregate over the hits.
  */
object StreamingTransitions {

  def transitionStream(events: DataFrame): Dataset[TransitionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long").as("userId"),
      col("ts_us").cast("long").as("tsUs"),
      col("event_id").cast("long").as("eventId"),
      col("event_type").as("eventType")).as[UserEvent]
    typed.groupByKey(_.userId)
      .flatMapGroupsWithState[(Long, Long, String), TransitionHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toIndexedSeq.sortBy(r => (r.tsUs, r.eventId))
          var prev = state.getOption
          val out = Vector.newBuilder[TransitionHit]
          sorted.foreach { r =>
            prev.foreach(p => out += TransitionHit(p._3, r.eventType))
            prev = Some((r.tsUs, r.eventId, r.eventType))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
