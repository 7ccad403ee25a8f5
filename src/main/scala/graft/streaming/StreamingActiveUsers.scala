package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming arm of the rolling-active-users dashboard
  * (`ev_active_users`): exact per-day DAU and trailing-7-day WAU over
  * an event stream.
  *
  * Shape mirrors the batch plan exactly: distinct (day, user) through
  * `dropDuplicates` state (one state row per distinct pair — the data
  * actually admitted, not the stream length), then an update-mode
  * count per day. The WAU arm fans each active day out to the seven
  * window-end days it keeps the user active for — the same bounded ×7
  * narrow fan-out that replaces the day×day range join in batch —
  * BEFORE the distinct, so the state key is (window-end day, user).
  * Counts are exact and micro-batch-chopping-independent: state
  * dedup makes re-arrivals idempotent, and the per-day counts only
  * grow as genuinely new pairs arrive.
  *
  * No watermark by design (exactness over state eviction — the batch
  * differential demands equality); a deployment bounding state would
  * add `withWatermark` + `dropDuplicatesWithinWatermark` and accept
  * the horizon.
  */
object StreamingActiveUsers {

  private val DayUs = 86400000000L

  /** Per-day distinct users: (day, dau), update mode. */
  def dauStream(events: DataFrame): DataFrame =
    events
      .select(expr(s"ts_us div $DayUs").as("day"), col("user_id"))
      .dropDuplicates("day", "user_id")
      .groupBy("day").agg(count(lit(1)).as("dau"))

  /** Trailing-7-day distinct users per window-end day: (day, wau),
    * update mode. Emits trailing partial windows past the last real
    * day too — the differential trims to the batch query's day set
    * (the batch side joins the real-day list; a stream cannot know
    * the future day set).
    */
  def wauStream(events: DataFrame): DataFrame =
    events
      .select(expr(s"ts_us div $DayUs").as("day"), col("user_id"))
      .select(explode(sequence(col("day"), col("day") + 6, lit(1))).as("day"),
        col("user_id"))
      .dropDuplicates("day", "user_id")
      .groupBy("day").agg(count(lit(1)).as("wau"))
}
