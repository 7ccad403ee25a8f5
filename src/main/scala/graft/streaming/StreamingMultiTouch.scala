package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (purchase, channel) credit under a multi-touch model, in the
  * batch queries' exact fixed point: hundredths of a cent via
  * (vc·10000·w_channel) div w_total. `(event_id, channel)` is the
  * idempotent sink key.
  */
final case class AttributedCredit(user_id: Long, event_id: Long,
                                  purchase_us: Long, channel: String,
                                  credit_fp: Long)

/** Streaming arm of `ev_attribution_linear` / `ev_attribution_time_decay`:
  * per-user MULTI-touch attribution as a `flatMapGroupsWithState`
  * fold. State per user is the touch list inside the trailing 7-day
  * window — BOUNDED BY THE WINDOW, not the stream: every arrival
  * prunes touches older than (now − 7d), since no future purchase
  * (event time only moves forward) can credit them; a hard
  * [[StreamingMultiTouch.MaxTouches]] cap (documented divergence:
  * oldest beyond the cap drop first) guards a pathological
  * single-user flood. Compare the batch side's per-user RANGE-frame
  * window pass, which re-sorts history every run.
  *
  * Weights mirror the batch queries termwise: linear = 1 per touch;
  * time-decay = 2^(6−b) for age bucket b = (offset−1) div 1d,
  * offsets 1us..7d (same-timestamp touches excluded, exactly the
  * RANGE frame's `-1` upper bound). Per purchase it emits one row per
  * channel with weight > 0, or a single 'direct' row — identical row
  * granularity to the batch arms, so the differential aggregates to
  * equality. In-batch arrivals sort by (ts_us, event_id) before the
  * fold; cross-batch event-time order is the source's contract.
  *
  * `events` needs (user_id, event_type, ts_us, event_id, value).
  */
object StreamingMultiTouch {

  val WindowUs: Long = 7L * 24 * 3600 * 1000000L
  val DayUs: Long = 24L * 3600 * 1000000L
  val MaxTouches: Int = 65536

  /** `decay = false` → linear weights, `true` → per-day halving. */
  def creditStream(events: DataFrame, decay: Boolean): Dataset[AttributedCredit] =
    credits(events, if (decay) "decay" else "linear")

  /** Position-based (U-shaped, 40/20/40) credits — the streaming twin
    * of `ev_attribution_u_shape`: first/last touch resolve by the
    * batch query's packed `us·4 + channel-code` min/max (so a
    * same-timestamp click/view pair breaks the tie identically), and
    * the endpoint boost is the same integer 2(k−2)/1/2(k−2) scheme.
    */
  def creditStreamU(events: DataFrame): Dataset[AttributedCredit] =
    credits(events, "ushape")

  private def credits(events: DataFrame, model: String): Dataset[AttributedCredit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("ts_us").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(Long, Boolean)], AttributedCredit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[Vector[(Long, Boolean)]]) =>
          // (touch ts_us, isClick), oldest first
          // Vector, not List: append and length are effectively O(1), so a
          // user riding the MaxTouches cap costs O(n) per micro-batch
          // instead of the O(n^2) a List append-walk would
          var touches = state.getOption.getOrElse(Vector.empty[(Long, Boolean)])
          val out = Seq.newBuilder[AttributedCredit]
          rows.toIndexedSeq.sortBy(r => (r._3, r._4)).foreach {
            case (_, et, us, eid, v) =>
              touches = touches.dropWhile(_._1 < us - WindowUs)
              if (et == "purchase") {
                val vc = math.floor(v * 100.0 + 0.5).toLong
                var wClick = 0L; var wView = 0L
                if (model == "ushape") {
                  val valid = touches.filter { case (t, _) =>
                    val o = us - t; o >= 1 && o <= WindowUs
                  }
                  val k = valid.length.toLong
                  if (k > 0) {
                    // the batch query's packed-key tie discipline
                    val keys = valid.map { case (t, isClick) =>
                      t * 4 + (if (isClick) 1L else 2L)
                    }
                    val fc = if (keys.min % 4 == 1) 1L else 0L
                    val lc = if (keys.max % 4 == 1) 1L else 0L
                    val nClick = valid.count(_._2).toLong
                    val f = if (k >= 3) 2L * (k - 2) else 1L
                    if (k == 1) { wClick = f * fc; wView = f * (1 - fc) }
                    else {
                      val midC = if (k >= 3) nClick - fc - lc else 0L
                      val midV = if (k >= 3) (k - nClick) - (1 - fc) - (1 - lc) else 0L
                      wClick = f * (fc + lc) + midC
                      wView = f * (2 - fc - lc) + midV
                    }
                  }
                } else touches.foreach { case (t, isClick) =>
                  val offset = us - t
                  if (offset >= 1 && offset <= WindowUs) {
                    val w =
                      if (model == "linear") 1L
                      else 1L << (6 - ((offset - 1) / DayUs)).toInt
                    if (isClick) wClick += w else wView += w
                  }
                }
                val wTot = wClick + wView
                if (wTot == 0L)
                  out += AttributedCredit(user, eid, us, "direct", vc * 10000L)
                else {
                  if (wClick > 0)
                    out += AttributedCredit(user, eid, us, "click",
                      vc * 10000L * wClick / wTot)
                  if (wView > 0)
                    out += AttributedCredit(user, eid, us, "view",
                      vc * 10000L * wView / wTot)
                }
              } else {
                touches = touches :+ (us, et == "click")
                if (touches.length > MaxTouches) touches = touches.tail
              }
          }
          state.update(touches)
          out.result().iterator
      }
  }
}
