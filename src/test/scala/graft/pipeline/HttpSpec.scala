package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.HttpOps
import graft.spec.Spec

/** HTTP step functions end-to-end against a local JDK HttpServer:
  * send-http delivery (incl. 5xx retry), send-receive-http transform,
  * expose-http ring serving with ETag + pagination.
  */
class HttpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def events(rows: (String, String)*) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
      .toDF("n", "d", "__seq", "arrival")
  }

  private def withServer(handler: (String, HttpExchange) => Unit)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      handler(body, x)
    })
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) x.getResponseBody.write(b)
    x.close()
  }

  test("metrics server exposes live counters after a batch run; other paths 404") {
    val collector = new Metrics.Collector
    spark.listenerManager.register(collector.listener)
    val server = new Metrics.Server(collector, "/metrics", 0)
    server.start()
    try {
      Metrics.observeIn(events("a" -> "1", "b" -> "2", "c" -> "3")).collect()
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String): java.net.http.HttpResponse[String] =
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:${server.boundPort}$path")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      // QueryExecutionListener delivery is async — poll the scrape
      val deadline = System.currentTimeMillis() + 20000
      var resp = get("/metrics")
      while (!resp.body().contains(s"${Metrics.InMetric} 3") &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100); resp = get("/metrics")
      }
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/plain; version=0.0.4"))
      assert(resp.body().contains(s"# TYPE ${Metrics.InMetric} counter"))
      assert(resp.body().contains(s"${Metrics.InMetric} 3"))
      assert(get("/other").statusCode() == 404)
    } finally {
      server.stop()
      spark.listenerManager.unregister(collector.listener)
    }
  }

  test("send-http posts one NDJSON body per vector and passes events through") {
    val received = new ConcurrentLinkedQueue[String]()
    withServer((body, x) => { received.add(body); respond(x, 200, "") }) { port =>
      val tpl = Spec.parseYaml(
        s"""name: p
           |window-key: global
           |steps:
           |  ship:
           |    window:
           |      events: 2
           |    reduce:
           |      send-http:
           |        target: "http://localhost:$port/ingest"
           |""".stripMargin)
      val stamped = BatchCompiler.stampInput(tpl, events("a" -> "1", "b" -> "2", "c" -> "3"), col("arrival"))
      val compiled = BatchCompiler.compile(spark, tpl, stamped)
      assert(compiled.output.count() == 3) // pass-through
      BatchRunner.run(compiled, HttpOps.HttpConf(backoffMs = 10))
      val bodies = received.toArray(Array.empty[String])
      assert(bodies.length == 2) // vectors (a,b) and (c)
      assert(bodies.exists(b => b.linesIterator.size == 2))
    }
  }

  test("send-http retries 5xx with backoff then succeeds") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer((_, x) => {
      if (attempts.incrementAndGet() <= 2) respond(x, 503, "busy")
      else respond(x, 200, "")
    }) { port =>
      val resp = HttpOps.send(s"http://localhost:$port/x", "POST", Map.empty, "{}",
        HttpOps.HttpConf(backoffMs = 5))
      assert(resp.statusCode() == 200)
      assert(attempts.get() == 3)
    }
  }

  test("send-receive-http replaces vectors with the response events; errors drop the vector") {
    withServer((body, x) => {
      if (body.contains("\"boom\"")) respond(x, 500, "")
      else {
        val count = body.linesIterator.size
        respond(x, 200, s"""{"n": "reply", "d": $count}""")
      }
    }) { port =>
      val tpl = Spec.parseYaml(
        s"""name: p
           |window-key: global
           |steps:
           |  call:
           |    window:
           |      events: 2
           |    reduce:
           |      send-receive-http:
           |        target: "http://localhost:$port/svc"
           |""".stripMargin)
      val stamped = BatchCompiler.stampInput(tpl,
        events("a" -> "1", "b" -> "2", "boom" -> "3", "boom" -> "4", "e" -> "5"),
        col("arrival"))
      val out = BatchCompiler.compile(spark, tpl, stamped).output
      val got = out.select("n", "d").collect().map(r => (r.getString(0), r.getString(1)))
      // vectors: (a,b) -> reply 2; (boom,boom) -> 500 -> dropped; (e) -> reply 1
      assert(got.toSet == Set(("reply", "2"), ("reply", "1")))
    }
  }

  test("undeliverable http payloads go to the dead letter, pipeline completes") {
    withServer((_, x) => respond(x, 500, "always broken")) { port =>
      val tpl = Spec.parseYaml(
        s"""name: p
           |steps:
           |  ship:
           |    flatmap:
           |      send-http:
           |        target: "http://localhost:$port/x"
           |""".stripMargin)
      val stamped = BatchCompiler.stampInput(tpl, events("a" -> "1"), col("arrival"))
      val compiled = BatchCompiler.compile(spark, tpl, stamped)
      // retries exhausted -> dead letter; the run itself must not throw
      BatchRunner.run(compiled, graft.io.HttpOps.HttpConf(retries = 1, backoffMs = 5))
      assert(compiled.output.count() == 1) // pass-through unaffected
    }
  }

  test("expose-http serves the ring with ETag, 304 and Link pagination") {
    val tpl = Spec.parseYaml(
      """name: p
        |window-key: global
        |steps:
        |  pub:
        |    window:
        |      events: 2
        |    reduce:
        |      expose-http:
        |        endpoint: "/latest"
        |        port: 0
        |        responses: 3
        |""".stripMargin)
    val stamped = BatchCompiler.stampInput(tpl, events("a" -> "1", "b" -> "2", "c" -> "3"), col("arrival"))
    val compiled = BatchCompiler.compile(spark, tpl, stamped)
    val result = BatchRunner.run(compiled)
    val server = result.exposeServers("pub")
    try {
      val port = {
        // server was started on an ephemeral port by the runner
        val f = server.getClass.getDeclaredField("server"); f.setAccessible(true)
        f.get(server).asInstanceOf[HttpServer].getAddress.getPort
      }
      val client = java.net.http.HttpClient.newHttpClient()
      def get(path: String, etag: Option[String] = None) = {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(s"http://localhost:$port$path"))
        etag.foreach(e => b.header("If-None-Match", e))
        client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val r1 = get("/latest")
      assert(r1.statusCode() == 200)
      assert(r1.body().contains("\"n\":\"c\"")) // newest vector (c)
      val etag = r1.headers().firstValue("ETag").get()
      assert(get("/latest", Some(etag)).statusCode() == 304)
      val next = r1.headers().firstValue("Link").get()
      val nextUrl = next.substring(next.indexOf('<') + 1, next.indexOf('>'))
      val r2 = get(nextUrl)
      assert(r2.statusCode() == 200 && r2.body().contains("\"n\":\"a\""))
      assert(get("/healthz").statusCode() == 200)
      // malformed pagination cursor is a client error, not a handler crash
      assert(get("/latest?previous=abc").statusCode() == 400)
      assert(get("/latest?previous=").statusCode() == 400)
    } finally server.stop()
  }
}
