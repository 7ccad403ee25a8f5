package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** LIVE Redis list-queue input as a DataSourceV2 `MicroBatchStream` —
  * the continuous-consumption face of the reference's `redis` input
  * (reference src/input/redis.ts:130-237), where [[IngestSources
  * .RedisIngest]] is the spool-then-replay face sharing the same wire
  * client.
  *
  * Why a queue pop maps to micro-batches naturally: each trigger's
  * admission IS one `LPOP key count` (one round trip, Redis ≥ 6.2),
  * and the streaming offset is simply the running count of popped
  * elements — monotone, contiguous, checkpointable. Per micro-batch:
  *
  *   - `latestOffset()` pops up to `maxPerTrigger` elements on the
  *     DRIVER (a list pop is inherently a single-consumer cursor —
  *     same shape as the reference's one consume loop) and buffers
  *     them; the new offset is the total popped count;
  *   - `planInputPartitions(start, end)` ships the buffered payload
  *     slice to the executors inside the `InputPartition` (the
  *     socket-source pattern: admission is driver-side, every
  *     downstream transform is distributed);
  *   - `commit(end)` trims the buffer below the committed offset.
  *
  * Delivery contract: a Redis list pop is DESTRUCTIVE, so elements
  * admitted but not yet committed at a crash are lost on restart —
  * at-most-once per element, exactly the reference's semantics (its
  * in-memory consumer has no checkpoint at all). Within one run,
  * micro-batch replay (e.g. a failed stage retry) re-reads the buffer,
  * not Redis, so no element is ever double-popped.
  *
  * Usage: `spark.readStream.format(classOf[RedisQueueSource].getName)
  * .option("host", h).option("port", p).option("key", q)
  * .option("maxPerTrigger", n).load()` or
  * [[graft.streaming.StreamCompiler.redisQueueSource]].
  */
class RedisQueueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RedisQueueSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new RedisQueueTable(
      Option(opts.get("host")).getOrElse("127.0.0.1"),
      Option(opts.get("port")).map(_.toInt).getOrElse(6379),
      opts.get("key"),
      Option(opts.get("maxPerTrigger")).map(_.toInt).getOrElse(1024))
  }
}

object RedisQueueSource {
  /** `value` is the popped element; `seq` its pop index ([[BrokerLines]]). */
  val schema: StructType = BrokerLines.schema
}

private[sources] class RedisQueueTable(host: String, port: Int, key: String,
                                       maxPerTrigger: Int)
    extends Table with SupportsRead {
  require(key != null && key.nonEmpty, "redis queue source needs a 'key' option")
  require(maxPerTrigger > 0, s"maxPerTrigger must be positive, got $maxPerTrigger")

  override def name(): String = s"redis($host:$port/$key)"
  override def schema(): StructType = RedisQueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RedisQueueSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RedisQueueStream(host, port, key, maxPerTrigger)
      }
    }
}

private[sources] class RedisQueueStream(host: String, port: Int, key: String,
                                        maxPerTrigger: Int)
    extends MicroBatchStream {

  // popped-but-uncommitted payloads; index i holds pop number base+i
  private val buffered = scala.collection.mutable.ArrayBuffer.empty[String]
  private var base = 0L // pop count already trimmed by commit()
  private var pos = 0L  // total popped so far (the high-water offset)
  private var client: graft.io.RespClient = _

  private def conn(): graft.io.RespClient = {
    if (client == null) client = new graft.io.RespClient(host, port)
    client
  }

  override def initialOffset(): Offset = CountOffset(0L)

  override def latestOffset(): Offset = synchronized {
    // one LPOP-count round trip = this trigger's bounded admission
    // (maxPerTrigger is the backpressure knob, as maxBytesPerTrigger
    // is for tail); a reconnect happens lazily on the next trigger
    // rather than failing the query on a transient broker drop
    val batch =
      try conn().lpopCount(key, maxPerTrigger)
      catch {
        case _: java.io.IOException =>
          try { if (client != null) client.close() } catch { case _: Exception => () }
          client = null
          Seq.empty
      }
    buffered ++= batch
    pos += batch.length
    CountOffset(pos)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"n"\s*:\s*(\d+)""".r
    val n = m.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    synchronized {
      // restart: anything checkpointed but unread is gone from Redis
      // (destructive pop — at-most-once, documented above); resume the
      // count so offsets stay monotone across the restart
      if (n > pos) { base = n; pos = n }
    }
    CountOffset(n)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CountOffset].n
    val e = end.asInstanceOf[CountOffset].n
    if (e <= s) return Array.empty
    synchronized {
      // clamp to the buffer: a replayed range from before this run's
      // base was lost with the pop (at-most-once on restart)
      val from = math.max(s, base)
      if (e <= from) Array.empty
      else Array(LineSlicePartition(
        buffered.slice((from - base).toInt, (e - base).toInt).toArray, from))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = LineSliceReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[CountOffset].n
    if (e > base) {
      buffered.dropInPlace((math.min(e, pos) - base).toInt)
      base = math.min(e, pos)
    }
  }

  override def stop(): Unit = {
    try { if (client != null) client.close() } catch { case _: Exception => () }
    client = null
  }
}
