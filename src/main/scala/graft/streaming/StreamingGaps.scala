package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (type, hour) arrival after bucketing. */
final case class TypedHour(eventType: String, h: Long)

/** A detected ingestion gap: `gap_len` missing hours starting at
  * `gap_start` for this event type.
  */
final case class GapRow(event_type: String, gap_start: Long, gap_len: Long)

/** Streaming ingestion-gap detection: the near-real-time arm of
  * `ev_gap_detect`. Events bucket to hours per row; per event type the
  * state is ONE long (the last hour seen), and an arrival that jumps
  * more than one hour past it emits the gap row immediately — the
  * "ingestion silently stopped" alert while it is happening, not at
  * the end-of-day batch audit. Hours inside a micro-batch are folded
  * in sorted order, so results are deterministic under shuffle
  * interleaving; with in-order arrival (the stream's contract — the
  * same one the sessionize/funnel arms state) the emitted gap list is
  * byte-for-byte the batch-derived one under ANY micro-batch chopping,
  * because the fold is associative over ordered hour runs: state
  * carries exactly the last hour across the boundary.
  */
object StreamingGaps {

  val HourUs = 3600000000L

  def gapStream(events: DataFrame): Dataset[GapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val hours = events.select(col("event_type").as("eventType"),
      expr(s"ts_us div $HourUs").as("h")).as[TypedHour]
    hours.groupByKey(_.eventType)
      .flatMapGroupsWithState[Long, GapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t, rows, state: GroupState[Long]) =>
          val hs = rows.map(_.h).toArray.distinct.sorted
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = Vector.newBuilder[GapRow]
          hs.foreach { h =>
            if (last != Long.MinValue && h > last + 1)
              out += GapRow(t, last + 1, h - last - 1)
            if (h > last) last = h
          }
          if (last != Long.MinValue) state.update(last)
          out.result().iterator
      }
  }

  /** The batch reference: gap rows derived from the full table —
    * distinct (type, hour), per-type sorted runs, one row per skip.
    * Shares [[gapStream]]'s bucketing so the differential is exact.
    */
  def gapsBatch(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val pres = events.select(col("event_type"),
        expr(s"ts_us div $HourUs").as("h")).distinct()
    pres.as[(String, Long)].groupByKey(_._1)
      .flatMapGroups { (t, rows) =>
        val hs = rows.map(_._2).toArray.sorted
        hs.iterator.zip(hs.iterator.drop(1)).collect {
          case (a, b) if b > a + 1 => GapRow(t, a + 1, b - a - 1)
        }
      }.toDF()
  }
}
