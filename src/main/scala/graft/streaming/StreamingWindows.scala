package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.TracePoint

/** Streaming event row: the canonical envelope plus bookkeeping
  * (event time in fractional unix seconds, arrival tiebreak).
  */
final case class SEvent(n: String, d: String, t: Seq[TracePoint], ts: Double, seq: Long)

/** One closed vector: the window id within its key plus its members
  * in arrival order.
  */
final case class SVector(key: String, vecId: Long, events: Seq[SEvent])

/** The reference's count-or-time window as a Structured Streaming
  * stateful operator (SURVEY.md §2.3: the single hardest streaming
  * piece): `flatMapGroupsWithState` keeps an open buffer + first-event
  * wall time per key; a vector closes at `maxEvents` buffered events
  * or `maxSeconds` after its first event (processing-time timeout,
  * matching the reference's wall-clock timers, src/step.ts:96-109).
  *
  * State per key is bounded by `maxEvents` events — no unbounded
  * growth; timeouts guarantee liveness for quiet keys.
  */
object StreamingWindows {

  final case class WinState(buf: Seq[SEvent], firstWallMs: Long, nextVec: Long)

  /** One open flatmap buffer: its id, creation wall time (the timer
    * anchor — reference src/step.ts:96-109 starts the timeout when the
    * buffer is created, i.e. at its head event), and the index of its
    * head event in the key's shared event ring. A flatmap buffer's
    * members are always a contiguous *suffix slice* of the arrival
    * sequence (every event joins every open buffer), so the state
    * stores each event once plus per-buffer offsets — O(maxEvents)
    * per key instead of the O(maxEvents²) of materializing each
    * buffer's members.
    */
  final case class FlatBuf(vecId: Long, firstWallMs: Long, startIdx: Long)

  /** Per-key flatmap state: `ring` holds events [ringStart, nextIdx)
    * (everything belonging to at least one open buffer), `bufs` is the
    * open-buffer queue in creation order (startIdx strictly
    * increasing, so sizes strictly decrease front to back).
    */
  final case class FlatState(ring: Seq[SEvent], ringStart: Long,
                             bufs: Seq[FlatBuf], nextVec: Long, nextIdx: Long)

  /** Streaming sessionization input: event time twice over — `ts` as a
    * TIMESTAMP for the watermark, `tsUs` as exact unix micros for the
    * gap arithmetic (identical to the batch query's `ts_us`).
    */
  final case class SessIn(userId: Long, eventId: Long, ts: java.sql.Timestamp,
                          tsUs: Long, value: Double)

  /** Per-user session state: the NEXT session number (1-based, matching
    * the batch running-sum numbering), whether a session is open, and
    * the open session's bounds/count/exact cent sum. A closed key keeps
    * only the counter — constant bytes per user, no timer armed.
    */
  final case class SessState(nextSess: Long, open: Boolean, startUs: Long,
                             lastUs: Long, n: Long, cents: Long)

  final case class Session(userId: Long, sessionId: Long, nEvents: Long,
                           startUs: Long, endUs: Long, sumValue: Double, durUs: Long)

  implicit val sEventEnc: Encoder[SEvent] = Encoders.product[SEvent]
  implicit val sVectorEnc: Encoder[SVector] = Encoders.product[SVector]
  implicit val winStateEnc: Encoder[WinState] = Encoders.product[WinState]
  implicit val flatStateEnc: Encoder[FlatState] = Encoders.product[FlatState]
  implicit val sessInEnc: Encoder[SessIn] = Encoders.product[SessIn]
  implicit val sessStateEnc: Encoder[SessState] = Encoders.product[SessState]
  implicit val sessionEnc: Encoder[Session] = Encoders.product[Session]
  implicit val stringEnc: Encoder[String] = Encoders.STRING
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Group `events` by `key` into count-or-time vectors. Emits closed
    * vectors (complete on the count arm, partial on the time arm).
    * Pass `maxSeconds <= 0` to disable the timer arm.
    */
  def hybridVectors(events: Dataset[SEvent], key: SEvent => String,
                    maxEvents: Int, maxSeconds: Double): Dataset[SVector] = {
    val maxMs = if (maxSeconds > 0) (maxSeconds * 1000).toLong else Long.MaxValue
    val timeout = if (maxSeconds > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(key)
      .flatMapGroupsWithState[WinState, SVector](OutputMode.Append, timeout) {
        (k: String, incoming: Iterator[SEvent], state: GroupState[WinState]) =>
          val st0 = state.getOption.getOrElse(WinState(Vector.empty, 0L, 0L))

          if (!incoming.hasNext && state.hasTimedOut) {
            // timer arm: flush the partial vector (reference src/step.ts:96-109)
            if (st0.buf.nonEmpty) {
              state.update(WinState(Vector.empty, 0L, st0.nextVec + 1))
              Iterator.single(SVector(k, st0.nextVec, st0.buf))
            } else {
              state.remove()
              Iterator.empty
            }
          } else {
            val now = System.currentTimeMillis()
            val out = Seq.newBuilder[SVector]
            var buf = st0.buf
            var firstWall = st0.firstWallMs
            var nextVec = st0.nextVec
            // a buffer whose deadline passed closes BEFORE this batch's
            // events join it — the reference's timer would have fired
            // between the arrivals (src/step.ts:96-109)
            if (buf.nonEmpty && now - firstWall >= maxMs) {
              out += SVector(k, nextVec, buf)
              buf = Vector.empty
              nextVec += 1
            }
            incoming.toSeq.sortBy(e => (e.ts, e.seq)).foreach { e =>
              if (buf.isEmpty) firstWall = now
              buf = buf :+ e
              if (buf.size >= maxEvents) { // count arm (src/step.ts:118-131)
                out += SVector(k, nextVec, buf)
                buf = Vector.empty
                nextVec += 1
              }
            }
            state.update(WinState(buf, firstWall, nextVec))
            if (buf.nonEmpty && maxMs != Long.MaxValue) {
              val elapsed = now - firstWall
              state.setTimeoutDuration(math.max(1L, maxMs - elapsed))
            }
            out.result().iterator
          }
      }
  }

  /** Event-time gap sessionization — the streaming arm of the batch
    * `ev_sessionize` query (EventQueries): a user's session closes when
    * the next event arrives more than `gapUs` after the last, or when
    * the WATERMARK passes last+gap (EventTimeTimeout), so quiet users
    * flush without waiting for their own next event. Sessions are
    * numbered 1-based per user in event-time order, value sums
    * accumulate as exact cents — both identical to the batch query, so
    * a stream fed in event-time order produces byte-identical rows
    * (the differential in StreamingSpec).
    *
    * Ordering contract: WITHIN a micro-batch events sort by (tsUs,
    * eventId) before folding, so intra-batch disorder is exact. An
    * event delivered in a LATER batch than its event time warrants
    * (late-but-within-watermark) is absorbed into whatever session is
    * then open — bounds widen correctly (startUs min, lastUs max), but
    * batch parity is only guaranteed for event-time-ordered feeds; a
    * late event that batch semantics would have placed before an
    * already-emitted gap cannot retroactively re-split it.
    *
    * Scale shape: state per user is one open session (6 fixed-width
    * fields) — independent of history length; closed keys hold just
    * the session counter and arm no timer. The input must carry a
    * watermark on `ts` for the timeout arm.
    *
    * Drain contract for FINITE replays: timeouts fire only when the
    * watermark advances, and the watermark only advances on new data —
    * so the terminal tail (each user's last open session) never
    * flushes on its own. A finite replay must append a sentinel event
    * (ts far past every real event, on a throwaway key) to push the
    * watermark over last+gap; StreamingSpec's differential does
    * exactly this.
    */
  def gapSessions(events: Dataset[SessIn], gapUs: Long): Dataset[Session] = {
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessState, Session](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, incoming: Iterator[SessIn], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(1L, open = false, 0L, 0L, 0L, 0L))
          val out = Seq.newBuilder[Session]
          def close(): Unit = {
            out += Session(uid, st.nextSess, st.n, st.startUs, st.lastUs,
              st.cents.toDouble / 100.0, st.lastUs - st.startUs)
            st = SessState(st.nextSess + 1, open = false, 0L, 0L, 0L, 0L)
          }
          if (!incoming.hasNext && state.hasTimedOut) {
            if (st.open) close()
            state.update(st) // keep the numbering; no timer on a closed key
          } else {
            // Eager-close a stale open session BEFORE folding: when data
            // for this key arrives in the same micro-batch the timer
            // would have fired (timers only fire for keys with no data),
            // the watermark may already sit past lastUs+gap, so close
            // here to emit at the batch boundary the timeout contract
            // promised. NOTE the deliberate tradeoff: a late-but-
            // admitted event with tsUs ≤ lastUs+gap would be ABSORBED
            // into the still-open session under batch semantics, but
            // eager-close has already split it into a new session —
            // timeout-consistent emission wins over late-event batch
            // parity, matching the class doc's in-order-only parity
            // contract.
            if (st.open && state.getCurrentWatermarkMs() * 1000L > st.lastUs + gapUs)
              close()
            incoming.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
              // exact DECIMAL(18,2) cents, as the batch query sums
              val cents = (BigDecimal(e.value)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
              if (st.open && e.tsUs - st.lastUs > gapUs) close()
              if (!st.open)
                st = st.copy(open = true, startUs = e.tsUs, lastUs = e.tsUs,
                  n = 1L, cents = cents)
              else
                st = st.copy(startUs = math.min(st.startUs, e.tsUs),
                  lastUs = math.max(st.lastUs, e.tsUs), n = st.n + 1,
                  cents = st.cents + cents)
            }
            state.update(st)
            if (st.open) {
              // must stay ahead of the current watermark or Spark rejects it
              val target = st.lastUs / 1000 + gapUs / 1000 + 1
              state.setTimeoutTimestamp(math.max(target, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }

  /** The reference's flatmap (sliding per-event) windows, live
    * (src/step.ts:84-131, goldens __tests__/step.ts:30-59): every
    * event opens a buffer, every event joins all open buffers; a
    * buffer closes full at `maxEvents` or partial `maxSeconds` after
    * its head event. A..E at size 3 ⇒ (A,B,C),(B,C,D),(C,D,E) live,
    * then (D,E),(E) on their timers.
    *
    * State per key is O(`maxEvents`): each event is stored once in a
    * shared ring, buffers are (id, wall-time, offset) triples over it;
    * the single per-key timer tracks the oldest open buffer's
    * deadline (buffers expire strictly in creation order, so no
    * later buffer can starve behind it).
    */
  def flatmapVectors(events: Dataset[SEvent], key: SEvent => String,
                     maxEvents: Int, maxSeconds: Double): Dataset[SVector] = {
    val maxMs = if (maxSeconds > 0) (maxSeconds * 1000).toLong else Long.MaxValue
    val timeout = if (maxSeconds > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(key)
      .flatMapGroupsWithState[FlatState, SVector](OutputMode.Append, timeout) {
        (k: String, incoming: Iterator[SEvent], state: GroupState[FlatState]) =>
          val st0 = state.getOption.getOrElse(FlatState(Vector.empty, 0L, Vector.empty, 0L, 0L))
          val now = System.currentTimeMillis()
          val out = Seq.newBuilder[SVector]
          var ring = st0.ring.toVector
          var ringStart = st0.ringStart
          var bufs = st0.bufs.toVector
          var nextVec = st0.nextVec
          var nextIdx = st0.nextIdx

          // close + emit the front buffer; the ring keeps only events
          // still owned by some open buffer
          def popFront(): Unit = {
            val b = bufs.head
            out += SVector(k, b.vecId, ring.drop((b.startIdx - ringStart).toInt))
            bufs = bufs.tail
            val newStart = bufs.headOption.map(_.startIdx).getOrElse(nextIdx)
            ring = ring.drop((newStart - ringStart).toInt)
            ringStart = newStart
          }

          // buffers close in creation order (sizes strictly decrease
          // front to back), so expiry is always a front-of-queue pop —
          // flush overdue buffers whether we woke on the timer or on
          // data (the reference's per-buffer timer would have fired
          // between the arrivals, src/step.ts:96-109)
          while (bufs.nonEmpty && now - bufs.head.firstWallMs >= maxMs) popFront()

          if (incoming.hasNext) {
            incoming.toSeq.sortBy(e => (e.ts, e.seq)).foreach { e =>
              ring = ring :+ e
              bufs = bufs :+ FlatBuf(nextVec, now, nextIdx)
              nextVec += 1
              nextIdx += 1
              // only the oldest buffer can reach maxEvents on this event
              if (nextIdx - bufs.head.startIdx >= maxEvents) popFront()
            }
          }

          if (bufs.isEmpty) state.remove()
          else {
            state.update(FlatState(ring, ringStart, bufs, nextVec, nextIdx))
            if (maxMs != Long.MaxValue)
              state.setTimeoutDuration(math.max(1L, maxMs - (now - bufs.head.firstWallMs)))
          }
          out.result().iterator
      }
  }

  /** One DAU/WAU contribution: an event on day `srcDay` keeps its user
    * active for the 7 window-end days [srcDay, srcDay+6]; `isDau` marks
    * the `day == srcDay` arm. `ts` carries the event time so the
    * watermark column survives the fan-out projection.
    */
  final case class ActiveContrib(day: Long, userId: Long, isDau: Boolean,
                                 ts: java.sql.Timestamp)

  /** Per-window-end-day state: distinct users seen on the day itself
    * (DAU) and across its trailing 7-day window (WAU), as sorted id
    * runs (a Set has no Spark encoder; dedup happens on insert).
    */
  final case class ActiveState(dauUsers: Seq[Long], wauUsers: Seq[Long])

  final case class ActiveDay(day: Long, dau: Long, wau: Long)

  implicit val activeContribEnc: Encoder[ActiveContrib] = Encoders.product[ActiveContrib]
  implicit val activeStateEnc: Encoder[ActiveState] = Encoders.product[ActiveState]
  implicit val activeDayEnc: Encoder[ActiveDay] = Encoders.product[ActiveDay]

  /** Rolling DAU/WAU, live — the streaming arm of the batch
    * `ev_active_users` query (EventQueries): per window-end day, the
    * distinct-user count for that day (DAU) and for its trailing 7-day
    * window (WAU). The SAME bounded ×7 contribution fan-out as the
    * batch plan — an event on day d contributes to window-end days
    * [d, d+6] — keyed by window-end day, so the state machine is an
    * ordinary distinct-accumulate per key, no range join, no rescan
    * of prior days when a new day opens.
    *
    * A window-end day is FINAL once the watermark passes the end of
    * that event-time day: the latest possible contributor to window d
    * is an event on day d itself (later days contribute only forward),
    * so the EventTimeTimeout fires at (day+1)·86400 s and emits the
    * day exactly once, then drops its state. Days with no real event
    * (pure trailing-window shadows, dauUsers empty) are suppressed —
    * the batch query's broadcast join against the real-day set.
    *
    * Scale shape: state per key is the day's distinct-user id set —
    * the irreducible exact-distinct payload, bounded by that day's
    * audience, held only for the 7-day horizon then freed on emit.
    * Feeds needing smaller state would swap the id sets for HLL
    * sketches and give up the exact batch differential.
    *
    * Same finite-replay drain contract as [[gapSessions]]: a sentinel
    * past lastDay+1 flushes every pending day.
    *
    * The watermark is declared HERE, on the fan-out's own `ts` (a typed
    * projection drops the upstream watermark tag, so an input-side
    * `withWatermark` can't reach the state operator); `delayThreshold`
    * is the caller's lateness budget, same meaning as on the input.
    */
  def activeUsers(events: Dataset[SessIn],
                  delayThreshold: String = "0 seconds"): Dataset[ActiveDay] = {
    val DayUs = 86400000000L
    events
      .flatMap { e =>
        val d0 = Math.floorDiv(e.tsUs, DayUs)
        (0 to 6).map(i => ActiveContrib(d0 + i, e.userId, i == 0, e.ts))
      }
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.day)
      .flatMapGroupsWithState[ActiveState, ActiveDay](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (day: Long, incoming: Iterator[ActiveContrib], state: GroupState[ActiveState]) =>
          if (!incoming.hasNext && state.hasTimedOut) {
            // watermark passed end-of-day: the window is final
            val st = state.get
            state.remove()
            if (st.dauUsers.nonEmpty)
              Iterator.single(ActiveDay(day, st.dauUsers.size.toLong, st.wauUsers.size.toLong))
            else Iterator.empty // shadow window of a dayless trailing edge
          } else {
            val st0 = state.getOption.getOrElse(ActiveState(Nil, Nil))
            var dau = st0.dauUsers.toSet
            var wau = st0.wauUsers.toSet
            incoming.foreach { c =>
              wau += c.userId
              if (c.isDau) dau += c.userId
            }
            state.update(ActiveState(dau.toSeq.sorted, wau.toSeq.sorted))
            // final at end-of-day (event time); keep ahead of the
            // current watermark or Spark rejects the timestamp
            val endOfDayMs = (day + 1) * (DayUs / 1000) + 1
            state.setTimeoutTimestamp(
              math.max(endOfDayMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
