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
    * buffer is created, i.e. at its head event), and members so far.
    */
  final case class FlatBuf(vecId: Long, firstWallMs: Long, events: Seq[SEvent])
  final case class FlatState(bufs: Seq[FlatBuf], nextVec: Long)

  implicit val sEventEnc: Encoder[SEvent] = Encoders.product[SEvent]
  implicit val sVectorEnc: Encoder[SVector] = Encoders.product[SVector]
  implicit val winStateEnc: Encoder[WinState] = Encoders.product[WinState]
  implicit val flatStateEnc: Encoder[FlatState] = Encoders.product[FlatState]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

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

  /** The reference's flatmap (sliding per-event) windows, live
    * (src/step.ts:84-131, goldens __tests__/step.ts:30-59): every
    * event opens a buffer, every event joins all open buffers; a
    * buffer closes full at `maxEvents` or partial `maxSeconds` after
    * its head event. A..E at size 3 ⇒ (A,B,C),(B,C,D),(C,D,E) live,
    * then (D,E),(E) on their timers.
    *
    * State per key is bounded: at most `maxEvents` open buffers of
    * fewer than `maxEvents` events each; the single per-key timer is
    * set to the earliest open buffer's deadline.
    */
  def flatmapVectors(events: Dataset[SEvent], key: SEvent => String,
                     maxEvents: Int, maxSeconds: Double): Dataset[SVector] = {
    val maxMs = if (maxSeconds > 0) (maxSeconds * 1000).toLong else Long.MaxValue
    val timeout = if (maxSeconds > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(key)
      .flatMapGroupsWithState[FlatState, SVector](OutputMode.Append, timeout) {
        (k: String, incoming: Iterator[SEvent], state: GroupState[FlatState]) =>
          val st0 = state.getOption.getOrElse(FlatState(Vector.empty, 0L))
          val now = System.currentTimeMillis()
          val out = Seq.newBuilder[SVector]
          var bufs = st0.bufs
          var nextVec = st0.nextVec

          if (!incoming.hasNext && state.hasTimedOut) {
            // timer arm: flush every buffer whose deadline passed
            val (expired, alive) = bufs.partition(b => now - b.firstWallMs >= maxMs)
            expired.sortBy(_.vecId).foreach(b => out += SVector(k, b.vecId, b.events))
            bufs = alive
          } else {
            incoming.toSeq.sortBy(e => (e.ts, e.seq)).foreach { e =>
              bufs = bufs :+ FlatBuf(nextVec, now, Vector.empty)
              nextVec += 1
              bufs = bufs.map(b => b.copy(events = b.events :+ e))
              val (full, open) = bufs.partition(_.events.size >= maxEvents)
              full.sortBy(_.vecId).foreach(b => out += SVector(k, b.vecId, b.events))
              bufs = open
            }
          }

          if (bufs.isEmpty) state.remove()
          else {
            state.update(FlatState(bufs, nextVec))
            if (maxMs != Long.MaxValue) {
              val earliest = bufs.map(_.firstWallMs).min
              state.setTimeoutDuration(math.max(1L, maxMs - (now - earliest)))
            }
          }
          out.result().iterator
      }
  }
}
