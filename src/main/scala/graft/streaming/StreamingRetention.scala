package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user's first activity on a new day-offset since their cohort
  * day. Each (user_id, day_offset) pair is emitted AT MOST ONCE over
  * the stream's lifetime, so the hits are idempotent: a sink can
  * `distinct()` across an at-least-once replay boundary and
  * `groupBy(cohort_day, day_offset).count()` to recover the batch
  * `ev_retention` cell matrix exactly.
  */
final case class RetentionHit(user_id: Long, cohort_day: Long, day_offset: Long)

/** Streaming arm of cohort retention (`ev_retention`): per-user
  * `flatMapGroupsWithState` with TWO LONGS of state — (cohort_day,
  * last_day_seen) — regardless of stream length. A billion users is a
  * billion 16-byte state rows partitioned by user_id; no day-set or
  * bitmap is kept because under the event-time replay contract (the
  * same per-user ordering the funnel and incremental-dedup arms
  * require) days arrive non-decreasing, so "first activity on a new
  * day" is exactly `day > last_day_seen`, and the first event overall
  * fixes the cohort day (= the batch `min(day)`).
  *
  * The cell matrix itself is NOT materialized in state — the stream
  * emits unit hits and the (tiny) matrix is an ordinary downstream
  * aggregation, which keeps this arm composable with any sink and the
  * state strictly per-user-constant.
  *
  * `events` needs (user_id, ts_us, event_id).
  */
object StreamingRetention {

  private val DayUs = 86400000000L

  def retentionHits(events: DataFrame): Dataset[RetentionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), RetentionHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[(Long, Long)]) =>
          // deterministic in-batch fold order no matter how the
          // shuffle interleaved arrivals
          val days = rows.toIndexedSeq.sortBy(r => (r._2, r._3))
            .map(r => r._2 / DayUs)
          if (days.isEmpty) Iterator.empty
          else {
            var (cohort, last) = state.getOption.getOrElse((days.head, Long.MinValue))
            val out = Seq.newBuilder[RetentionHit]
            days.foreach { d =>
              if (d > last) {
                out += RetentionHit(user, cohort, d - cohort)
                last = d
              }
            }
            state.update((cohort, last))
            out.result().iterator
          }
      }
  }
}
