package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Push/pull ingest sources built on the spool-directory pattern: a
  * driver-side receiver appends atomically-renamed NDJSON files to a
  * directory that a Structured Streaming file source tails. This is
  * the robust offline-capable shape for the reference's `http` and
  * `poll` inputs (src/input/http.ts, src/input/poll.ts): Spark's file
  * source gives exactly-once offsets per file, the receiver gives the
  * network face; a custom DataSourceV2 MicroBatchStream would remove
  * the directory hop at the cost of re-implementing offset tracking.
  *
  * The same spool contract is the documented adapter point for
  * brokered inputs (AMQP/MQTT/Redis): any consumer that writes
  * NDJSON batches into the spool integrates identically (no broker
  * client libraries ship in this environment).
  */
object IngestSources {

  /** Streaming NDJSON/raw-line reader over a directory (the streaming
    * face of the reference's `stdin`; also the spool reader).
    *
    * `maxFilesPerTrigger > 0` bounds each micro-batch's admission: a
    * flooded spool drains in bounded slices instead of becoming one
    * unbounded batch — the streaming analog of the reference's
    * backpressure reactions (reference src/metrics.ts:80-173).
    */
  def streamLines(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream
    (if (maxFilesPerTrigger > 0)
       reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else reader).text(dir)
  }

  /** True `tail`: follow appends to ONE file with byte-offset
    * checkpoints and start/end modes (reference
    * src/input/tail.ts:76-141) — see [[FileTailSource]].
    */
  def tailFile(spark: SparkSession, path: String, startAt: String = "end",
               maxBytesPerTrigger: Long = 0L): DataFrame = {
    val reader = spark.readStream
      .format(classOf[FileTailSource].getName)
      .option("path", path)
      .option("startAt", startAt)
    (if (maxBytesPerTrigger > 0)
       reader.option("maxBytesPerTrigger", maxBytesPerTrigger.toString)
     else reader).load()
  }

  /** The reference's `http` input (src/input/http.ts:90-165): an
    * embedded POST endpoint receiving NDJSON bodies; every accepted
    * body becomes one spool file. GET /healthz responds 200; bodies
    * while the spool is saturated get 503 (the reference's
    * backpressure response).
    */
  final class HttpIngest(endpoint: String, port: Int, spoolDir: String,
                         maxSpoolFiles: Int = 10000) {
    private val counter = new AtomicLong(0)
    private var server: HttpServer = _
    private val dir = Paths.get(spoolDir)

    def start(): Int = {
      Files.createDirectories(dir)
      server = HttpServer.create(new InetSocketAddress(port), 0)
      server.createContext("/healthz", (x: HttpExchange) => {
        val b = "OK".getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
      })
      server.createContext(endpoint, (x: HttpExchange) => {
        if (x.getRequestMethod != "POST") { x.sendResponseHeaders(405, -1); x.close() }
        else if (spoolSize() >= maxSpoolFiles) { x.sendResponseHeaders(503, -1); x.close() }
        else {
          val body = x.getRequestBody.readAllBytes()
          appendSpool(dir, counter.incrementAndGet(), body)
          x.sendResponseHeaders(200, -1); x.close()
        }
      })
      server.start()
      server.getAddress.getPort
    }

    private def spoolSize(): Long = {
      val s = Files.list(dir)
      try s.count() finally s.close()
    }

    def stop(): Unit = if (server != null) server.stop(0)
  }

  /** The reference's `poll` input (src/input/poll.ts:106-189):
    * periodic GET of a target, ETag-deduplicated, each changed body
    * spooled. `pollOnce` is the unit the schedule drives (call it from
    * a driver timer or external scheduler).
    */
  final class PollIngest(target: String, spoolDir: String,
                         headers: Map[String, String] = Map.empty) {
    private val counter = new AtomicLong(0)
    @volatile private var lastEtag: Option[String] = None
    private val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)

    // bounded timeouts so a hung target fails the round instead of
    // wedging the driver timer that schedules the polls
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()

    def pollOnce(): Boolean = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(target)).GET()
        .timeout(java.time.Duration.ofSeconds(30))
      headers.foreach { case (k, v) => b.header(k, v) }
      lastEtag.foreach(e => b.header("If-None-Match", e))
      val resp = client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() == 304) false
      else if (resp.statusCode() >= 200 && resp.statusCode() < 300) {
        val etag = resp.headers().firstValue("ETag")
        lastEtag = if (etag.isPresent) Some(etag.get()) else None
        appendSpool(dir, counter.incrementAndGet(), resp.body())
        true
      } else false
    }
  }

  /** The reference's `redis` input (src/input/redis.ts:130-237): a
    * driver-side consumer over the pure-JVM RESP client — BLPOP from a
    * list queue, or SUBSCRIBE to a channel — appending each drained
    * batch to the spool the streaming file source tails. Exactly-once
    * then comes from the file source's per-file offsets; the BLPOP pop
    * itself is at-most-once per element, same as the reference.
    */
  final class RedisIngest(host: String, port: Int, spoolDir: String,
                          batchMax: Int = 256) {
    private val counter = new AtomicLong(0)
    private val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)

    /** Drain up to `batchMax` queued elements from `key` (first pop
      * blocks up to `blockSeconds`), spool them as one NDJSON file.
      * Returns the number of elements consumed; 0 = timeout, nothing
      * queued. Call in a loop from a driver thread.
      */
    def consumeOnce(client: graft.io.RespClient, key: String,
                    blockSeconds: Int = 1): Int = {
      client.blpop(blockSeconds, key) match {
        case None => 0
        case Some((_, first)) =>
          val batch = Seq.newBuilder[String]
          batch += first
          var n = 1
          var more = true
          while (n < batchMax && more) client.lpop(key) match {
            case Some(v) => batch += v; n += 1
            case None    => more = false
          }
          spoolLines(batch.result())
          n
      }
    }

    /** Blocking subscribe loop: spool each pushed message as it
      * arrives. Runs until the connection closes (EOFException).
      */
    def subscribeLoop(client: graft.io.RespClient, channel: String): Unit = {
      client.subscribe(channel)
      try {
        while (true) spoolLines(Seq(client.nextMessage()._2))
      } catch { case _: java.io.EOFException => () }
    }

    private def spoolLines(lines: Seq[String]): Unit =
      appendSpool(dir, counter.incrementAndGet(),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** The reference's `amqp` input (src/input/amqp.ts:181-343): a
    * driver-side consumer over the pure-JVM AMQP 0-9-1 client —
    * assert exchange (default `cdp`/topic), assert a (possibly
    * server-named) queue with its x-arguments, bind with the
    * per-exchange-type default pattern (direct→"cdp", fanout→"",
    * topic→"#", amqp.ts:283-289), then consume with per-message ack —
    * appending each message body to the spool the streaming file
    * source tails.
    */
  final class AmqpIngest(spoolDir: String) {
    private val counter = new AtomicLong(0)
    private val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)

    /** Exchange/queue/bind assertion; returns the queue to consume. */
    def assertTopology(c: graft.io.AmqpClient,
                       exchange: String = "cdp", exchangeType: String = "topic",
                       exchangeDurable: Boolean = true, exchangeAutoDelete: Boolean = false,
                       queueName: String = "", queueDurable: Boolean = true,
                       queueAutoDelete: Boolean = false,
                       queueArgs: Seq[(String, Any)] = Seq.empty,
                       bindingPattern: Option[String] = None): String = {
      c.exchangeDeclare(exchange, exchangeType, exchangeDurable, exchangeAutoDelete)
      val q = c.queueDeclare(queueName, queueDurable, queueAutoDelete, queueArgs)
      val pattern = bindingPattern.getOrElse(
        Map("direct" -> "cdp", "fanout" -> "", "topic" -> "#")(exchangeType))
      c.queueBind(q, exchange, pattern)
      q
    }

    /** Blocking consume loop: spool each delivered body, ack it. Runs
      * until the connection closes. Returns messages consumed.
      */
    def consumeLoop(c: graft.io.AmqpClient, queue: String): Long = {
      c.basicConsume(queue)
      var n = 0L
      var more = true
      while (more) c.nextDelivery() match {
        case Some(d) =>
          spoolLines(Seq(d.bodyText))
          c.basicAck(d.deliveryTag)
          n += 1
        case None => more = false
      }
      n
    }

    private def spoolLines(lines: Seq[String]): Unit =
      appendSpool(dir, counter.incrementAndGet(),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** The reference's `mqtt` input (src/input/mqtt.ts:109-213): a
    * driver-side consumer over the pure-JVM MQTT 3.1.1 client —
    * subscribe to the topic filter (default `cdp/#`,
    * mqtt.ts:96-97), spool each message payload as it arrives.
    */
  final class MqttIngest(spoolDir: String) {
    private val counter = new AtomicLong(0)
    private val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)

    /** Blocking subscribe loop: spool each published payload (qos-1
      * deliveries are acked by the client). Runs until the connection
      * closes. Returns messages consumed.
      */
    def subscribeLoop(c: graft.io.MqttClient, topicFilter: String = "cdp/#",
                      qos: Int = 0): Long = {
      c.subscribe(topicFilter, qos)
      var n = 0L
      var more = true
      while (more) c.nextMessage() match {
        case Some((_, payload)) =>
          spoolLines(Seq(payload))
          n += 1
        case None => more = false
      }
      n
    }

    private def spoolLines(lines: Seq[String]): Unit =
      appendSpool(dir, counter.incrementAndGet(),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Atomic spool append: write to a temp name, rename into place, so
    * the streaming file source never reads a partial file.
    */
  private def appendSpool(dir: Path, id: Long, body: Array[Byte]): Unit = {
    val tmp = dir.resolve(s".tmp-$id")
    val fin = dir.resolve(f"batch-$id%012d.ndjson")
    Files.write(tmp, body)
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }
}
