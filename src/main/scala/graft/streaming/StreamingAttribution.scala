package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attributed purchase: the channel is the user's most recent
  * click/view within 7 days strictly before the purchase (the batch
  * `ev_attribution_last_touch` rule), 'direct' otherwise. Revenue in
  * exact cents, same fixed-point as the batch side.
  */
final case class AttributedPurchase(user_id: Long, event_id: Long,
                                    purchase_us: Long, channel: String,
                                    revenue_cents: Long)

/** Streaming arm of `ev_attribution_last_touch`: per-user last-touch
  * attribution as a `flatMapGroupsWithState` fold. State per user is
  * ONE (timestamp, channel) pair — the most recent touch — fixed size
  * regardless of stream length (the 100-TB shape: a billion users is
  * a billion 16-byte-ish state rows, partitioned by user; compare the
  * batch side's per-user ordered window, which re-sorts history every
  * run).
  *
  * Each purchase emits EXACTLY ONE attributed row at the micro-batch
  * that carries it (append semantics — rows are never revised, so
  * the arm writes straight to append-only file sinks), using the state as of that point in the per-user
  * (ts_us, event_id) order — in-batch arrivals are sorted before the
  * fold, so shuffle interleaving never reorders it, and the
  * differential pins stream == batch under any micro-batch chopping.
  * Cross-batch event-time order is the source's contract, like every
  * arm here.
  *
  * `events` needs (user_id, event_type, ts_us, event_id, value).
  */
object StreamingAttribution {

  val WindowUs: Long = 7L * 24 * 3600 * 1000000L

  def attributionStream(events: DataFrame): Dataset[AttributedPurchase] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("ts_us").cast("long"), col("event_id").cast("long"),
        col("value").cast("double"))
      .as[(Long, String, Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), AttributedPurchase](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[(Long, String)]) =>
          var (touchUs, touchType) = state.getOption.getOrElse((Long.MinValue, ""))
          val out = Seq.newBuilder[AttributedPurchase]
          rows.toIndexedSeq.sortBy(r => (r._3, r._4)).foreach {
            case (_, et, us, eid, v) =>
              if (et == "purchase") {
                val channel =
                  if (touchUs != Long.MinValue && touchUs >= us - WindowUs) touchType
                  else "direct"
                // same fixed-point as the batch side's floor(v*100+0.5);
                // event_id makes the row a natural idempotent-sink key
                out += AttributedPurchase(user, eid, us, channel,
                  math.floor(v * 100.0 + 0.5).toLong)
              } else { touchUs = us; touchType = et }
          }
          val res = out.result()
          if (touchUs != Long.MinValue) state.update((touchUs, touchType))
          res.iterator
      }
  }
}
