package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** LIVE HTTP-push input as a DataSourceV2 `MicroBatchStream` — the
  * continuous face of the reference's `http` input (reference
  * src/input/http.ts:90-165), where [[IngestSources.HttpIngest]] is
  * the spool-then-replay face sharing the same endpoint contract.
  *
  * A [[BufferedPushStream]] whose "wire client" is an embedded HTTP
  * server owned by the driver-side collector: each accepted POST
  * body's NDJSON lines join the buffer; offsets are arrival counts.
  * The reference's server face is mirrored exactly:
  *   - `POST endpoint` — body lines admitted, 200 (http.ts:113-123);
  *     while the admitted-but-UNSERVED backlog is at `maxBuffered`,
  *     503 WITHOUT reading the body — the reference's backpressure
  *     response. The gate drains when a micro-batch takes the lines
  *     (consumption, like the reference's queue capacity), NOT when
  *     the checkpoint commits: the engine only commits while
  *     constructing a later batch, so a commit-keyed gate deadlocks
  *     once one burst fills the cap (503 forever, no new data, no
  *     commit). Buffer memory stays bounded at ~cap + one batch.
  *   - `GET /healthz` — `application/health+json` pass (http.ts:124-135).
  *   - anything else — 404 (http.ts:136-143).
  *
  * Delivery contract: a 200 makes the batch this process's
  * responsibility — admitted-but-uncommitted lines are lost on crash
  * (at-most-once), exactly the reference consumer (its queue has no
  * checkpoint at all); senders that need stronger guarantees retry on
  * 503/connection-refused, which only ever errs toward redelivery.
  *
  * Usage: `spark.readStream.format(classOf[HttpPushSource].getName)
  * .option("port", p).option("endpoint", "/events").load()` or
  * [[graft.streaming.StreamCompiler.httpPushSource]]. `port` 0 binds
  * an ephemeral port, published under the query's checkpoint location
  * in [[HttpPushSource.boundPorts]] once the collector is up.
  */
class HttpPushSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerLines.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HttpPushTable(
      Option(opts.get("port")).map(_.toInt).getOrElse(0),
      Option(opts.get("endpoint")).getOrElse("/events"),
      Option(opts.get("maxBuffered")).map(_.toInt).getOrElse(65536),
      Option(opts.get("maxBodyBytes")).map(_.toLong).getOrElse(16L << 20))
  }
}

object HttpPushSource {
  /** checkpointLocation -> actually-bound server port, for callers
    * (and tests) that configured port 0.
    */
  val boundPorts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

private[sources] class HttpPushTable(port: Int, endpoint: String, maxBuffered: Int,
                                     maxBodyBytes: Long)
    extends Table with SupportsRead {
  require(maxBuffered > 0, s"maxBuffered must be positive, got $maxBuffered")
  require(maxBodyBytes > 0, s"maxBodyBytes must be positive, got $maxBodyBytes")
  require(endpoint.startsWith("/"), s"endpoint must start with '/', got $endpoint")

  override def name(): String = s"http-push(:$port$endpoint)"
  override def schema(): StructType = BrokerLines.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BrokerLines.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpPushStream(port, endpoint, maxBuffered, maxBodyBytes, checkpointLocation)
      }
    }
}

private[sources] class HttpPushStream(port: Int, endpoint: String, maxBuffered: Int,
                                      maxBodyBytes: Long, checkpointLocation: String)
    extends BufferedPushStream {

  private val admitted = new AtomicLong(0)
  @volatile private var server: HttpServer = _
  private val stopped = new java.util.concurrent.CountDownLatch(1)

  override protected def collect(append: (String, Long) => Unit): Unit = {
    val srv = HttpServer.create(new InetSocketAddress(port), 0)
    server = srv
    srv.createContext("/", (x: HttpExchange) => {
      try {
        if (x.getRequestMethod == "POST" && x.getRequestURI.getPath == endpoint) {
          val declared = Option(x.getRequestHeaders.getFirst("Content-Length"))
            .flatMap(_.toLongOption).getOrElse(-1L)
          if (unservedBacklog >= maxBuffered) {
            x.sendResponseHeaders(503, -1) // backpressure, body unread
          } else if (declared > maxBodyBytes) {
            x.sendResponseHeaders(413, -1) // one body can't flood the driver heap
          } else {
            // cap the read too (chunked bodies carry no Content-Length)
            val cap = math.min(maxBodyBytes, (Int.MaxValue - 1).toLong).toInt
            val body = x.getRequestBody.readNBytes(cap + 1)
            if (body.length > maxBodyBytes) x.sendResponseHeaders(413, -1)
            else {
              val lines = new String(body, UTF_8).split('\n').iterator.filter(_.nonEmpty)
              lines.foreach(l => append(l, admitted.incrementAndGet()))
              x.sendResponseHeaders(200, -1)
            }
          }
        } else if (x.getRequestMethod == "GET" && x.getRequestURI.getPath == "/healthz") {
          val b = """{"status":"pass"}""".getBytes(UTF_8)
          x.getResponseHeaders.set("Content-Type", "application/health+json")
          x.sendResponseHeaders(200, b.length)
          x.getResponseBody.write(b)
        } else x.sendResponseHeaders(404, -1)
      } finally x.close()
    })
    srv.start()
    HttpPushSource.boundPorts.put(checkpointLocation, srv.getAddress.getPort)
    stopped.await() // the collector thread just holds the server open
  }

  override protected def closeClient(): Unit = {
    val s = server
    server = null
    if (s != null) s.stop(0)
    HttpPushSource.boundPorts.remove(checkpointLocation)
    stopped.countDown()
  }
}
