package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A session's running concurrent-event count (stream-static interval
  * join), stamped with the state version so a sink reader can isolate
  * the latest count per session.
  */
final case class IntervalCount(user_id: Long, session_id: Long,
                               n_concurrent: Long, version: Long)

/** Watermarked stream-stream joins — the Spark-native upgrade for the
  * reference's external-store correlation pattern: its users join a
  * live stream against earlier events by round-tripping through a
  * database (reference `examples/persistence-with-hasura/pipeline.yaml`
  * posts events to Hasura and queries them back per event). Structured
  * Streaming holds the join state in the engine instead: both sides
  * carry event-time watermarks, the range condition bounds how long a
  * row stays joinable, and expired state is evicted automatically.
  */
object StreamJoins {

  /** Streaming as-of join: for every `right` event (e.g. purchase),
    * the latest `left` event (e.g. view) of the same user that
    * precedes it by (ts_us, event_id) order, within `lookbackUs`.
    * Emits (event_id, user_id, gap_us) — the same shape and, when the
    * lookback covers the replayed span, the same ROWS as the batch
    * `ev_asof_join` query (the differential in StreamingSpec).
    *
    * `joinType = "left_outer"` keeps right events with NO preceding
    * match (gap_us null) — Spark emits the unmatched side once the
    * watermark proves no match can still arrive, so the outer rows
    * carry the same lookback-delayed emission contract as everything
    * else here.
    *
    * Both inputs need schema (user_id, event_id, ts, ts_us) with a
    * watermark already set on `ts`.
    *
    * Shape and state story:
    *  - the inner join keys on user_id with a time-RANGE condition
    *    (`l.ts BETWEEN r.ts - lookback AND r.ts`), so Spark retains
    *    left-side state only `lookbackUs` past the watermark and
    *    right-side state to the watermark — bounded, independent of
    *    stream length. The lookback IS the state bound: "as-of any
    *    event ever" (batch unbounded-preceding) is not a streaming
    *    shape; pick the lookback your domain means by "recent".
    *  - the exact tie rule rides as an extra non-range predicate:
    *    strictly-preceding by (ts_us, event_id), so a same-microsecond
    *    left event counts only when its event_id is lower — identical
    *    to the batch window's ROWS ... 1 PRECEDING ordering.
    *  - "latest preceding" is a second stateful operator: max(ts_us)
    *    grouped by the right event with its event-time column in the
    *    keys, so the group finalizes (append-mode emission) once the
    *    watermark passes the right event's timestamp. Two stateful
    *    ops chained — join then agg — is the supported Spark 3.5+
    *    multiple-stateful-operator pipeline.
    *  - finite replays drain like every event-time pipeline here — a
    *    far-future sentinel on both sides — but note the OUTPUT
    *    watermark of the join trails the input watermark by the
    *    left-state retention (the lookback), so the chained
    *    aggregation finalizes a purchase only when
    *    watermark - lookback passes it: sentinels must overshoot the
    *    last real event by MORE than the lookback. Emission latency in
    *    production is likewise one lookback behind the live edge —
    *    another reason the lookback should be the domain's honest
    *    "recent", not a defensive maximum.
    */
  def asofJoin(left: DataFrame, right: DataFrame, lookbackUs: Long,
               joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"asofJoin supports inner | left_outer (outer = keep right rows with no match), got $joinType")
    val l = left.select(col("user_id").as("l_user"), col("event_id").as("l_eid"),
      col("ts").as("l_ts"), col("ts_us").as("l_ts_us"))
    val r = right.select(col("user_id").as("r_user"), col("event_id").as("event_id"),
      col("ts").as("r_ts"), col("ts_us").as("r_ts_us"))
    // microsecond interval, so sub-second lookbacks are honored
    // exactly instead of truncating to INTERVAL 0 SECOND
    val lookbackExpr = s"INTERVAL $lookbackUs MICROSECOND"
    val cond = expr(s"""r_user = l_user
                       | AND l_ts BETWEEN r_ts - $lookbackExpr AND r_ts
                       | AND (l_ts_us < r_ts_us OR (l_ts_us = r_ts_us AND l_eid < event_id))
                       |""".stripMargin.replace("\n", ""))
    // the caller's "left_outer" keeps every RIGHT event, so the
    // preserved stream rides as the outer side: right_outer of l.join(r)
    val joined =
      if (joinType == "inner") r.join(l, cond, "inner")
      else l.join(r, cond, "right_outer")
    joined
      .groupBy(col("event_id"), col("r_user"), col("r_ts"), col("r_ts_us"))
      .agg(max(col("l_ts_us")).as("last_l_us")) // max skips the outer nulls
      .select(col("event_id"), col("r_user").as("user_id"),
        (col("r_ts_us") - col("last_l_us")).as("gap_us")) // null gap = no match
  }

  /** Streaming arm of the interval-overlap join (`ev_interval_join`):
    * probe events arrive as a stream, the session intervals are a
    * STATIC table (the persisted-index pattern shared with the
    * incremental dedup/sketch arms). Same bin-bucket decomposition as
    * the batch query — intervals pre-explode to the hour bins they
    * cover, each probe event lives in EXACTLY ONE bin, so the
    * stream-static equi-join on the bin is stateless per micro-batch
    * and a matched pair appears exactly once; the exact BETWEEN +
    * user-inequality filter runs after it. The only state is the
    * running count per (user_id, session_id) — one long — folded by
    * `flatMapGroupsWithState`, so after any micro-batch chopping the
    * latest count per session equals the batch `n_concurrent`
    * (StreamingSpec pins the differential; sessions nothing streamed
    * ever hit simply never emit — the batch left-join's zero rows).
    *
    * `sessions` needs (user_id, session_id, start_us, end_us);
    * `events` needs (o_user, ts_us).
    */
  def intervalJoinStream(sessions: DataFrame, events: DataFrame,
                         binUs: Long = 3600L * 1000000L): Dataset[IntervalCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    val sBins = sessions
      .select(col("user_id"), col("session_id"), col("start_us"), col("end_us"))
      .withColumn("bin", explode(sequence(
        expr(s"start_us div ${binUs}L"), expr(s"end_us div ${binUs}L"))))
    val hits = events
      .select(col("o_user").cast("long").as("o_user"),
        col("ts_us").cast("long").as("ts_us"))
      .withColumn("bin", expr(s"ts_us div ${binUs}L"))
      .join(sBins, Seq("bin"))
      .filter(col("ts_us").between(col("start_us"), col("end_us")) &&
        col("o_user") =!= col("user_id"))
      .select(col("user_id"), col("session_id")).as[(Long, Long)]
    hits.groupByKey(identity)
      .flatMapGroupsWithState[(Long, Long), IntervalCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[(Long, Long)]) =>
          var (cnt, ver) = state.getOption.getOrElse((0L, 0L))
          cnt += rows.size; ver += 1
          state.update((cnt, ver))
          Iterator(IntervalCount(key._1, key._2, cnt, ver))
      }
  }
}
