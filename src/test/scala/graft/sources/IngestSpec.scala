package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.BrokerSink

class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def post(port: Int, path: String, body: String): Int = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://localhost:$port$path"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  test("http ingest spools posted NDJSON bodies; 503 past the spool cap") {
    val dir = Files.createTempDirectory("spool").toString
    val ingest = new IngestSources.HttpIngest("/events", 0, dir, maxSpoolFiles = 2)
    val port = ingest.start()
    try {
      assert(post(port, "/events", "{\"n\":\"a\"}\n{\"n\":\"b\"}") == 200)
      assert(post(port, "/events", "{\"n\":\"c\"}") == 200)
      assert(post(port, "/events", "{\"n\":\"d\"}") == 503) // backpressure
      val lines = spark.read.text(dir).collect().map(_.getString(0)).toSet
      assert(lines == Set("{\"n\":\"a\"}", "{\"n\":\"b\"}", "{\"n\":\"c\"}"))
    } finally ingest.stop()
  }

  test("poll ingest dedupes via ETag") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/feed", (x: HttpExchange) => {
      hits.incrementAndGet()
      val ifNone = Option(x.getRequestHeaders.getFirst("If-None-Match"))
      if (ifNone.contains("\"v1\"")) { x.sendResponseHeaders(304, -1); x.close() }
      else {
        x.getResponseHeaders.add("ETag", "\"v1\"")
        val b = "{\"n\":\"polled\"}".getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
      }
    })
    server.start()
    try {
      val dir = Files.createTempDirectory("poll").toString
      val poll = new IngestSources.PollIngest(s"http://localhost:${server.getAddress.getPort}/feed", dir)
      assert(poll.pollOnce())        // first fetch spools
      assert(!poll.pollOnce())       // 304 — nothing new
      assert(spark.read.text(dir).count() == 1)
    } finally server.stop(0)
  }

  test("broker sink delivers with one client per partition and routing keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("broker").toString
    val lines = Seq("{\"n\":\"x.a\"}", "{\"n\":\"y.b\"}").toDF("line")
    BrokerSink.deliver(lines, BrokerSink.FileFactory(dir),
      payload => if (payload.contains("x.")) "route.x" else "route.y")
    val delivered = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(delivered == Set("route.x\t{\"n\":\"x.a\"}", "route.y\t{\"n\":\"y.b\"}"))
  }
}
