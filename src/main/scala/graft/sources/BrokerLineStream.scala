package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{AcceptsLatestSeenOffset, MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared plumbing for the broker-fed line streams ([[RedisQueueSource]]
  * pull-per-trigger, [[AmqpQueueSource]] / [[MqttStreamSource]]
  * push-collected): a `(value, seq)` schema where `seq` is the monotone
  * arrival index (the pop/delivery counter — the same role the byte
  * offset plays for the tail source), slice partitions shipping one
  * admitted micro-batch to the executors, and the count offset.
  */
object BrokerLines {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))
}

/** Total lines admitted from the broker since stream start. */
case class CountOffset(n: Long) extends Offset {
  override def json: String = s"""{"n":$n}"""
}

object CountOffset {
  def parse(json: String): CountOffset = {
    val m = """"n"\s*:\s*(\d+)""".r
    CountOffset(m.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L))
  }
}

/** One admitted micro-batch slice; `firstSeq` is the arrival index of
  * `values(0)`.
  */
case class LineSlicePartition(values: Array[String], firstSeq: Long) extends InputPartition

object LineSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val LineSlicePartition(values, firstSeq) = partition.asInstanceOf[LineSlicePartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < values.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(values(i)), firstSeq + i)
      override def close(): Unit = ()
    }
  }
}

/** Driver-buffered `MicroBatchStream` over a PUSH-protocol broker
  * (AMQP deliveries, MQTT publishes): a collector thread drains the
  * blocking wire client into a bounded-growth buffer as messages
  * arrive; each trigger's `latestOffset` simply reads the buffered
  * high-water count (Spark's socket-source shape — admission is
  * driver-side, every downstream transform is distributed).
  *
  * Each buffered line carries a protocol tag (AMQP deliveryTag; unused
  * for MQTT): `commit(end)` trims the buffer below the committed
  * offset and hands the LAST trimmed tag to [[onCommitted]], which is
  * where AMQP turns checkpoint commits into cumulative broker acks —
  * at-least-once end to end, because un-acked deliveries outlive a
  * crashed run and get redelivered to the next one. Note the engine
  * commits a batch's end offset at the start of the NEXT trigger
  * cycle, so broker acks trail the sink by one micro-batch (the same
  * lag as Kafka consumer commits under Structured Streaming) — an
  * idle stream's tail stays un-acked until data flows again, which
  * only ever errs toward redelivery, never loss.
  *
  * Within one run, micro-batch replay (a failed stage retry) re-reads
  * the buffer, not the broker, so no delivery is ever double-admitted.
  */
abstract class BufferedPushStream extends MicroBatchStream with AcceptsLatestSeenOffset {

  /** Start the protocol collector: connect, subscribe/consume, and
    * call `append(line, tag)` for every arriving message until
    * [[stop]] closes the returned handle. Runs on a daemon thread
    * owned by this class; implementations just loop their client.
    */
  protected def collect(append: (String, Long) => Unit): Unit

  /** Close the wire client so the blocked [[collect]] loop unwinds. */
  protected def closeClient(): Unit

  /** Commit hook: the protocol tags of the lines the checkpoint just
    * committed, in arrival order. AMQP acks `trimmedTags.last`
    * cumulatively (one frame per commit); MQTT has no cumulative ack,
    * so it PUBACKs each qos-1 packet id individually.
    */
  protected def onCommitted(trimmedTags: Array[Long]): Unit = ()

  // lines [base, pos) awaiting commit; tags(i) belongs to buffered(i)
  private val buffered = scala.collection.mutable.ArrayBuffer.empty[String]
  private val tags = scala.collection.mutable.ArrayBuffer.empty[Long]
  private var base = 0L
  private var pos = 0L
  @volatile private var closed = false
  private var collector: Thread = _

  // A collect() that THROWS while the stream is still live (bind/
  // connect failure at startup is the common case — port in use far
  // outranks broker death) must not leave a silently empty stream:
  // the failure is stashed here and rethrown from the next trigger's
  // latestOffset, failing the query with the real cause.
  @volatile private var collectorFailure: Throwable = _

  private def ensureCollector(): Unit = synchronized {
    if (collector == null) {
      collector = new Thread(() => {
        try collect { (line, tag) =>
          BufferedPushStream.this.synchronized {
            buffered += line; tags += tag; pos += 1
          }
        } catch {
          case _: Exception if closed => ()
          case e: Exception => collectorFailure = e
        }
      }, s"graft-push-collector-${getClass.getSimpleName}")
      collector.setDaemon(true)
      collector.start()
    }
  }

  override def initialOffset(): Offset = CountOffset(0L)

  override def latestOffset(): Offset = {
    ensureCollector()
    val failed = collectorFailure
    if (failed != null && !closed)
      throw new IllegalStateException(
        s"${getClass.getSimpleName} collector died: ${failed.getMessage}", failed)
    synchronized { live = true; CountOffset(pos) }
  }

  // becomes true at the first trigger's latestOffset; offsets the
  // engine hands us BEFORE that are checkpoint state from a previous
  // run (restart recovery) — after it, they are this run's own logged
  // batches and must never rebase
  private var live = false

  /** Restart rebase. The checkpoint's offset range [0, r) belongs to
    * the PREVIOUS run: what it admitted but never committed is the
    * broker's to redeliver (AMQP, un-acked) or to have dropped (MQTT
    * qos 0). A fresh instance counts from 0, so its admissions must be
    * renumbered to continue the checkpoint's count — INCLUDING any
    * lines the collector already admitted before the rebase arrived
    * (they are new-this-run lines, never offsets of the old range).
    * Without that, the engine's recovery-time `commit(r)` can land
    * after an early burst of admissions and trim r of THIS run's lines
    * as if already committed — silent loss on an at-least-once source.
    *
    * The engine delivers `r` through [[setLatestSeenOffset]] at stream
    * init — before the first trigger, so before the collector even
    * starts admitting. The [[deserializeOffset]] path also rebases,
    * but ONLY pre-`live`: once this run has produced an offset itself,
    * a deserialized offset is one of our own logged batch ends (the
    * engine deserializes lazily at plan time) and rebasing on it would
    * inflate `pos` without data — a runaway empty-batch loop.
    */
  private def rebase(r: Long): Unit = synchronized {
    if (!live && r > base) {
      pos = r + (pos - base) // renumber the (pos - base) buffered lines
      base = r
    }
  }

  override def setLatestSeenOffset(o: Offset): Unit = rebase(o match {
    case c: CountOffset => c.n
    case other          => CountOffset.parse(other.json).n
  })

  override def deserializeOffset(json: String): Offset = {
    val o = CountOffset.parse(json)
    rebase(o.n)
    o
  }

  // highest offset handed to a planned micro-batch. This, NOT the
  // committed offset, is the drain signal for admission gates: the
  // engine only calls commit(N) while constructing a LATER batch, and
  // a later batch needs new data — so a gate keyed on uncommitted
  // backlog deadlocks the moment one burst fills the cap (everything
  // 503s, no new data, the engine never commits, the gate never
  // opens). Served lines are the pipeline's responsibility already;
  // the buffer they occupy is freed at the commit that trails by one
  // batch, keeping memory bounded at ~cap + one batch's admissions.
  private var served = 0L

  /** Lines admitted but not yet handed to any micro-batch — what a
    * backpressure face should 503 on (mirrors the reference's
    * in-memory queue capacity, which drains on CONSUMPTION, not on
    * checkpoint).
    */
  protected final def unservedBacklog: Long =
    synchronized(pos - math.max(served, base))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].n
    val e = end.asInstanceOf[CountOffset].n
    synchronized {
      served = math.max(served, e)
      val from = math.max(s, base)
      if (e <= s || e <= from) Array.empty
      else Array(LineSlicePartition(
        buffered.slice((from - base).toInt, (e - base).toInt).toArray, from))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = LineSliceReaderFactory

  override def commit(end: Offset): Unit = {
    val trimmed = synchronized {
      val e = math.min(end.asInstanceOf[CountOffset].n, pos)
      if (e <= base) Array.empty[Long]
      else {
        val drop = (e - base).toInt
        val t = tags.take(drop).toArray
        buffered.dropInPlace(drop); tags.dropInPlace(drop)
        base = e
        t
      }
    }
    if (trimmed.nonEmpty) onCommitted(trimmed)
  }

  override def stop(): Unit = {
    closed = true
    try closeClient() catch { case _: Exception => () }
  }
}
