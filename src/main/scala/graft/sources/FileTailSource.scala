package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** True `tail` input: follow appends to ONE file with a byte-offset
  * cursor, mirroring the reference's tail input (reference
  * src/input/tail.ts:76-141 — `path` + `start-at: start|end`, default
  * `end`, line-separated on `\r?\n`, file touched into existence
  * before tailing) as a DataSourceV2 `MicroBatchStream`:
  *
  *   - the streaming offset IS the byte position, checkpointed through
  *     the WAL, so a restarted query resumes exactly after the last
  *     committed line — stronger than the reference's in-memory cursor;
  *   - every micro-batch boundary sits on a newline (found by a bounded
  *     backwards scan from EOF), so a reader never emits a partial line
  *     that a concurrent writer is still appending;
  *   - `maxBytesPerTrigger` bounds one micro-batch's admission, the
  *     tail-side analog of the spool reader's `maxFilesPerTrigger`
  *     (backpressure: a flooded file drains in bounded slices).
  *
  * A single file tail is inherently serial, so each batch is one input
  * partition; the path must be reachable where the reader runs (local
  * mode: the driver host; a cluster needs a shared filesystem — same
  * constraint the reference's single-process tail has, minus the
  * process boundary). Truncation/rotation is a documented divergence:
  * offsets never move backwards; restart the query to re-read a
  * rotated file.
  *
  * Usage: `spark.readStream.format(classOf[FileTailSource].getName)
  * .option("path", p).option("startAt", "start"|"end").load()` or
  * [[IngestSources.tailFile]].
  */
class FileTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTailSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FileTailTable(
      opts.get("path"),
      Option(opts.get("startAt")).getOrElse("end"),
      Option(opts.get("maxBytesPerTrigger")).map(_.toLong).getOrElse(0L))
  }
}

object FileTailSource {
  /** `value` is the line text; `pos` its starting byte offset — a
    * monotone arrival sequence number for free (streaming plans can't
    * use `monotonically_increasing_id`).
    */
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("pos", org.apache.spark.sql.types.LongType, nullable = false)))
}

/** Byte position after the last committed complete line. */
case class TailOffset(pos: Long) extends Offset {
  override def json: String = s"""{"pos":$pos}"""
}

private[sources] class FileTailTable(path: String, startAt: String, maxBytes: Long)
    extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "tail source needs a 'path' option")
  require(startAt == "start" || startAt == "end",
    s"startAt must be 'start' or 'end', got '$startAt'")

  override def name(): String = s"tail($path)"
  override def schema(): StructType = FileTailSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FileTailSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FileTailStream(path, startAt, maxBytes)
      }
    }
}

private[sources] class FileTailStream(path: String, startAt: String, maxBytes: Long)
    extends MicroBatchStream {

  private val p = Paths.get(path)
  // reduce the chance of the file not existing before tailing
  // (reference tail.ts:100-105 touches it open-append)
  try { if (!Files.exists(p)) Files.createFile(p) } catch { case _: Exception => () }

  // high-water of offsets this stream has handed out: keeps latestOffset
  // monotone even if the file shrinks underneath us (truncation is a
  // documented divergence — never re-read backwards within one run)
  @volatile private var highWater = 0L

  private def fileLen: Long = if (Files.exists(p)) Files.size(p) else 0L

  /** Position just after the last '\n' at or below `limit` — a bounded
    * backwards chunk scan, so batch ends always sit on line boundaries
    * and the scan cost is proportional to the final partial line, not
    * the file.
    */
  private def lastLineBoundary(limit: Long): Long = {
    if (limit <= 0) return 0L
    val raf = new RandomAccessFile(p.toFile, "r")
    try {
      val chunk = 8192
      val buf = new Array[Byte](chunk)
      var end = math.min(limit, raf.length())
      while (end > 0) {
        val start = math.max(0L, end - chunk)
        raf.seek(start)
        val n = (end - start).toInt
        raf.readFully(buf, 0, n)
        var i = n - 1
        while (i >= 0) {
          if (buf(i) == '\n') return start + i + 1
          i -= 1
        }
        end = start
      }
      0L
    } finally raf.close()
  }

  /** Position just after the first '\n' at or beyond `from`, or `from`
    * itself if the remainder holds no complete line yet — the
    * minimum-progress fallback when one line is longer than the
    * per-trigger byte budget.
    */
  private def firstLineBoundaryAfter(from: Long): Long = {
    val raf = new RandomAccessFile(p.toFile, "r")
    try {
      val len = raf.length()
      val chunk = 8192
      val buf = new Array[Byte](chunk)
      var pos = from
      while (pos < len) {
        raf.seek(pos)
        val n = math.min(chunk.toLong, len - pos).toInt
        raf.readFully(buf, 0, n)
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') return pos + i + 1
          i += 1
        }
        pos += n
      }
      from
    } finally raf.close()
  }

  override def initialOffset(): Offset = {
    val pos = if (startAt == "start") 0L else lastLineBoundary(fileLen)
    highWater = math.max(highWater, pos)
    TailOffset(pos)
  }

  override def latestOffset(): Offset = {
    // bound this batch's admission to maxBytes past the last handed-out
    // offset (0 = unbounded), then align down to a newline; if the
    // budget is smaller than the next line, still admit that one line
    // so a tight budget bounds batches without stalling the stream
    val len = fileLen
    val cap = if (maxBytes > 0) math.min(len, highWater + maxBytes) else len
    var pos = lastLineBoundary(cap)
    if (pos <= highWater && len > highWater) pos = firstLineBoundaryAfter(highWater)
    highWater = math.max(highWater, pos)
    TailOffset(highWater)
  }

  override def deserializeOffset(json: String): Offset = {
    val m = """"pos"\s*:\s*(\d+)""".r
    val pos = m.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    highWater = math.max(highWater, pos)
    TailOffset(pos)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].pos
    val e = end.asInstanceOf[TailOffset].pos
    if (e <= s) Array.empty
    else Array(TailPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = TailReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One byte range [start, end) of the tailed file; `end` is always a
  * newline boundary.
  */
case class TailPartition(path: String, start: Long, end: Long) extends InputPartition

object TailReaderFactory extends PartitionReaderFactory {
  /** Chunked scan size. The [start, end) range streams through in
    * bounded chunks — the first micro-batch over a pre-existing
    * multi-GB file (startAt=start, maxBytesPerTrigger unset) must not
    * allocate (end-start) bytes at once, and (end-start) can exceed
    * Int.MaxValue. Peak memory is ChunkSize + the longest line.
    */
  private val ChunkSize = 1 << 20

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val TailPartition(path, start, end) = partition.asInstanceOf[TailPartition]
    new PartitionReader[InternalRow] {
      private val raf = { val r = new RandomAccessFile(path, "r"); r.seek(start); r }
      private var pos = start // next file byte to fetch into `chunk`
      private var chunk: Array[Byte] = Array.emptyByteArray
      private var ci = 0
      // partial line carried across chunk boundaries; byte-accurate
      // offsets (UTF-8 multibyte safe) because the split runs on raw bytes
      private val pending = new java.io.ByteArrayOutputStream()
      private var lineStart = start
      private var current: (Long, String) = _

      private def nextLine(): (Long, String) = {
        while (ci < chunk.length || pos < end) {
          if (ci >= chunk.length) {
            val n = math.min(ChunkSize.toLong, end - pos).toInt
            val buf = new Array[Byte](n)
            raf.readFully(buf)
            pos += n; chunk = buf; ci = 0
          }
          while (ci < chunk.length) {
            val b = chunk(ci); ci += 1
            if (b == '\n') {
              val bytes = pending.toByteArray
              pending.reset()
              val off = lineStart
              lineStart = off + bytes.length + 1
              var le = bytes.length
              if (le > 0 && bytes(le - 1) == '\r') le -= 1
              if (le > 0) return (off, new String(bytes, 0, le, StandardCharsets.UTF_8))
            } else pending.write(b)
          }
        }
        null // `end` sits on a newline boundary, so pending is empty here
      }

      override def next(): Boolean = {
        current = nextLine()
        current != null
      }

      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current._2), current._1)

      override def close(): Unit = raf.close()
    }
  }
}
