package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** LIVE polling input as a DataSourceV2 `MicroBatchStream` — the
  * continuous face of the reference's `poll` input (reference
  * src/input/poll.ts:106-189), where [[IngestSources.PollIngest]] is
  * the spool-then-replay face sharing the same ETag contract.
  *
  * Pull-per-trigger, the [[RedisQueueSource]] shape: `latestOffset()`
  * performs (at most once per `intervalMs`) one GET of the target on
  * the driver and buffers the body's NDJSON lines; the offset is the
  * running line count PLUS the latest ETag — so the dedup state rides
  * the stream checkpoint and a restarted query does NOT re-admit a
  * body it already saw. Deduplication is double-layered:
  *   - `If-None-Match` makes a compliant server answer 304 with no
  *     body (cheaper than the reference, which always re-fetches);
  *   - an equal ETag on a 200 skips the body anyway — byte-for-byte
  *     the reference's client-side check (poll.ts:123-146) for
  *     servers that ignore conditional headers.
  * A target that serves no ETag at all admits every poll, like the
  * reference. Poll errors skip the round and the next trigger retries
  * (poll.ts logs-and-continues the same way).
  *
  * Delivery contract: admitted-but-uncommitted lines are lost on crash
  * (at-most-once) — the reference's in-memory queue has no checkpoint
  * at all; the ETag-in-offset makes the loss window explicit and
  * bounded to one body.
  *
  * Usage: `spark.readStream.format(classOf[PollStreamSource].getName)
  * .option("target", url).option("intervalMs", 1000).load()` or
  * [[graft.streaming.StreamCompiler.pollSource]].
  */
class PollStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerLines.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PollStreamTable(
      opts.get("target"),
      Option(opts.get("intervalMs")).map(_.toLong).getOrElse(1000L))
  }
}

/** Count offset extended with the poll ETag so the dedup state is
  * checkpointed with the position it belongs to.
  */
case class PollOffset(n: Long, etag: String) extends Offset {
  override def json: String = {
    val e = etag.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"n":$n,"etag":"$e"}"""
  }
}

object PollOffset {
  private val N = """"n"\s*:\s*(\d+)""".r
  private val E = """"etag"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
  def parse(json: String): PollOffset = PollOffset(
    N.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L),
    E.findFirstMatchIn(json).map(m => unescape(m.group(1))).getOrElse(""))
  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o   => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.result()
  }
}

private[sources] class PollStreamTable(target: String, intervalMs: Long)
    extends Table with SupportsRead {
  require(target != null && target.nonEmpty, "poll source needs a 'target' option")

  override def name(): String = s"poll($target)"
  override def schema(): StructType = BrokerLines.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BrokerLines.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PollStream(target, intervalMs)
      }
    }
}

private[sources] class PollStream(target: String, intervalMs: Long)
    extends MicroBatchStream {

  private val buffered = scala.collection.mutable.ArrayBuffer.empty[String]
  private var base = 0L // line count already trimmed by commit()
  private var pos = 0L  // total lines admitted (the high-water offset)
  private var lastEtag = ""
  private var lastPollMs = 0L

  override def initialOffset(): Offset = PollOffset(0L, "")

  override def latestOffset(): Offset = synchronized {
    val now = System.currentTimeMillis()
    if (now - lastPollMs >= intervalMs) {
      lastPollMs = now
      try pollOnce()
      catch { case _: Exception => () } // next trigger retries (poll.ts:149-151)
    }
    PollOffset(pos, lastEtag)
  }

  // bounded timeouts: the GET runs on the trigger thread, so a hung
  // target must fail the round (and get retried next trigger), not
  // stall the whole stream
  @transient private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5)).build()

  private def pollOnce(): Unit = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(target)).GET()
      .timeout(java.time.Duration.ofSeconds(30))
    if (lastEtag.nonEmpty) b.header("If-None-Match", lastEtag)
    val resp = http.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString(java.nio.charset.StandardCharsets.UTF_8))
    if (resp.statusCode() >= 200 && resp.statusCode() < 300) {
      val etag = resp.headers().firstValue("ETag").orElse("")
      if (etag.isEmpty || etag != lastEtag) { // client-side equivalence check
        lastEtag = etag
        val lines = resp.body().split('\n').iterator.filter(_.nonEmpty)
        lines.foreach { l => buffered += l; pos += 1 }
      }
    } // 304 (conditional hit) and errors admit nothing
  }

  override def deserializeOffset(json: String): Offset = {
    val o = PollOffset.parse(json)
    synchronized {
      // restart: resume the count AND the ETag dedup state — without
      // the latter a restarted query would re-admit the body it
      // already processed
      if (o.n > pos) { base = o.n; pos = o.n; lastEtag = o.etag }
    }
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PollOffset].n
    val e = end.asInstanceOf[PollOffset].n
    if (e <= s) return Array.empty
    synchronized {
      // clamp to the buffer: a replayed range from before this run's
      // base was lost with the crash (at-most-once, documented above)
      val from = math.max(s, base)
      if (e <= from) Array.empty
      else Array(LineSlicePartition(
        buffered.slice((from - base).toInt, (e - base).toInt).toArray, from))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = LineSliceReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PollOffset].n
    if (e > base) {
      buffered.dropInPlace((math.min(e, pos) - base).toInt)
      base = math.min(e, pos)
    }
  }

  override def stop(): Unit = ()
}
