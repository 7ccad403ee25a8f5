package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TracePoint
import graft.spec.Spec

class StreamRunnerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ev(n: String, d: String, seq: Long): SEvent =
    SEvent(n, d, Seq(TracePoint(1000.0 + seq, "t", "h")), 1000.0 + seq, seq)

  test("runner delivers send-file taps per micro-batch and runs the output query") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingWindows.sEventEnc
    val sinkFile = Files.createTempDirectory("srun").resolve("out.ndjson").toString
    val tpl = Spec.parseYaml(
      s"""name: runpipe
         |steps:
         |  mark:
         |    flatmap:
         |      rename:
         |        prepend: "r."
         |  tap:
         |    after: [mark]
         |    flatmap:
         |      send-file: "$sinkFile"
         |""".stripMargin)
    val mem = MemoryStream[SEvent]
    val running = StreamRunner.start(spark, tpl, mem.toDS(),
      outputSink = "noop", triggerMs = 100)
    try {
      mem.addData(ev("a", "1", 1), ev("b", "2", 2))
      val deadline = System.currentTimeMillis() + 20000
      while (!Files.exists(java.nio.file.Paths.get(sinkFile)) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      var lines = Seq.empty[String]
      while (lines.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        if (Files.exists(java.nio.file.Paths.get(sinkFile)))
          lines = scala.jdk.CollectionConverters.ListHasAsScala(
            Files.readAllLines(java.nio.file.Paths.get(sinkFile))).asScala.toSeq
      }
      assert(lines.size == 2, s"got $lines")
      assert(lines.forall(_.startsWith("{\"n\":\"r.")))
    } finally running.stopAll()
  }

  test("metrics server scrapes live in/out counters from a streaming run") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingWindows.sEventEnc
    val collector = new graft.pipeline.Metrics.Collector
    val server = new graft.pipeline.Metrics.Server(collector, "/metrics", 0)
    server.start()
    val tpl = Spec.parseYaml(
      """name: metered
        |steps:
        |  mark:
        |    flatmap:
        |      rename:
        |        prepend: "m."
        |""".stripMargin)
    val mem = MemoryStream[SEvent]
    val running = StreamRunner.start(spark, tpl, mem.toDS(),
      outputSink = "noop", triggerMs = 100, collector = Some(collector))
    try {
      mem.addData(ev("a", "1", 1), ev("b", "2", 2), ev("c", "3", 3))
      val client = java.net.http.HttpClient.newHttpClient()
      def scrape(): String =
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:${server.boundPort}/metrics")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      val deadline = System.currentTimeMillis() + 20000
      var body = scrape()
      while (!(body.contains(s"${graft.pipeline.Metrics.InMetric} 3") &&
               body.contains(s"${graft.pipeline.Metrics.OutMetric} 3")) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(100); body = scrape()
      }
      assert(body.contains(s"# TYPE ${graft.pipeline.Metrics.InMetric} counter"), body)
      assert(body.contains(s"${graft.pipeline.Metrics.InMetric} 3"), body)
      assert(body.contains(s"${graft.pipeline.Metrics.OutMetric} 3"), body)
    } finally {
      running.stopAll()
      server.stop()
      spark.streams.removeListener(collector.streamingListener)
    }
  }

  test("streaming expose-http serves closed vectors from the driver ring") {
    implicit val sqlCtx = spark.sqlContext
    import StreamingWindows.sEventEnc
    val tpl = Spec.parseYaml(
      """name: expo
        |steps:
        |  pub:
        |    window:
        |      events: 2
        |    reduce:
        |      expose-http:
        |        endpoint: "/latest"
        |        port: 0
        |        responses: 5
        |""".stripMargin)
    val mem = MemoryStream[SEvent]
    val running = StreamRunner.start(spark, tpl, mem.toDS(),
      outputSink = "noop", triggerMs = 100)
    try {
      val port = running.exposeServers("pub").boundPort
      mem.addData(ev("a", "1", 1), ev("a", "2", 2))
      val client = java.net.http.HttpClient.newHttpClient()
      def get(): java.net.http.HttpResponse[String] =
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:$port/latest")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      val deadline = System.currentTimeMillis() + 20000
      var resp = get()
      while (resp.statusCode() != 200 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); resp = get()
      }
      assert(resp.statusCode() == 200)
      val body = resp.body()
      assert(body.linesIterator.count(_.nonEmpty) == 2) // the (1,2) vector, NDJSON
      assert(body.contains("\"d\":1") && body.contains("\"d\":2"))
    } finally running.stopAll()
  }
}
