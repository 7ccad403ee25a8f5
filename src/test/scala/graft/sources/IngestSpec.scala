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

  test("tail reader streams a multi-chunk range without materializing it") {
    // lines sized so several cross the reader's 1 MiB chunk boundary;
    // total ~3.5 MiB exercises >3 refills in one partition (the shape
    // of a first batch over a pre-existing file with no byte budget)
    val f = Files.createTempFile("tailbig", ".ndjson")
    val line = "x" * 9973 // prime-ish: boundaries land mid-line
    val count = 370
    val w = Files.newBufferedWriter(f)
    (0 until count).foreach { i => w.write(s"$i:$line"); w.write("\n") }
    w.close()
    val endPos = Files.size(f)
    val reader = TailReaderFactory.createReader(TailPartition(f.toString, 0L, endPos))
    var n = 0
    var lastOffset = -1L
    while (reader.next()) {
      val row = reader.get()
      val s = row.getUTF8String(0).toString
      assert(s == s"$n:$line", s"line $n corrupted across chunk boundary")
      val off = row.getLong(1)
      assert(off > lastOffset)
      lastOffset = off
      n += 1
    }
    reader.close()
    assert(n == count)
    val lastLineBytes = s"${count - 1}:$line".length
    assert(lastOffset == endPos - lastLineBytes - 1)
    Files.delete(f)
  }

  test("tail start mode follows appends to one file across micro-batches") {
    val file = Files.createTempFile("tail", ".log")
    Files.writeString(file, "{\"a\":1}\n{\"a\":2}\n")
    val q = IngestSources.tailFile(spark, file.toString, startAt = "start")
      .writeStream.format("memory").queryName("tail_start").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_start").count() == 2)
      Files.writeString(file, "{\"a\":3}\n", java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(spark.table("tail_start").count() == 3)
      // a partial line (no trailing newline yet) must NOT be emitted...
      Files.writeString(file, "{\"a\":4}", java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      assert(spark.table("tail_start").count() == 3)
      // ...until the writer completes it
      Files.writeString(file, "\n", java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      val vals = spark.table("tail_start").collect().map(_.getString(0)).toSet
      assert(vals == Set("{\"a\":1}", "{\"a\":2}", "{\"a\":3}", "{\"a\":4}"))
    } finally q.stop()
  }

  test("tail end mode starts at the current EOF: only later appends are seen") {
    val file = Files.createTempFile("tailend", ".log")
    Files.writeString(file, "{\"old\":1}\n{\"old\":2}\n")
    val q = IngestSources.tailFile(spark, file.toString, startAt = "end")
      .writeStream.format("memory").queryName("tail_end").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_end").count() == 0)
      Files.writeString(file, "{\"new\":1}\n", java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      val vals = spark.table("tail_end").collect().map(_.getString(0)).toSet
      assert(vals == Set("{\"new\":1}"))
    } finally q.stop()
  }

  test("tail byte offsets checkpoint: a restarted query resumes, not re-reads") {
    import org.apache.spark.sql.DataFrame
    val file = Files.createTempFile("tailck", ".log")
    val ckpt = Files.createTempDirectory("tailck-ckpt").toString
    Files.writeString(file, "one\ntwo\n")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run() = IngestSources.tailFile(spark, file.toString, startAt = "start")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: DataFrame, _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(0))))
      .start()
    val q1 = run()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size() == 2)
    Files.writeString(file, "three\n", java.nio.file.StandardOpenOption.APPEND)
    val q2 = run()
    try { q2.processAllAvailable() } finally q2.stop()
    // the restart delivered ONLY the appended line — 3 total, no dups
    assert(scala.jdk.CollectionConverters.IteratorHasAsScala(seen.iterator()).asScala.toSeq
      .sorted == Seq("one", "three", "two"))
  }

  test("tail maxBytesPerTrigger bounds each micro-batch, stream still drains") {
    import org.apache.spark.sql.DataFrame
    val file = Files.createTempFile("tailmax", ".log")
    Files.writeString(file, (1 to 6).map(i => s"line-$i").mkString("", "\n", "\n"))
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = IngestSources.tailFile(spark, file.toString, startAt = "start",
        maxBytesPerTrigger = 15) // ~2 seven-byte lines per batch
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => { val c = b.count(); if (c > 0) sizes.add(c); () })
      .start()
    try q.processAllAvailable() finally q.stop()
    val s = scala.jdk.CollectionConverters.IteratorHasAsScala(sizes.iterator()).asScala.toSeq
    assert(s.sum == 6, s"batches=$s")
    assert(s.max <= 2, s"batches=$s")
    assert(s.size >= 3, s"batches=$s")
  }

  test("tailSource parses tailed NDJSON lines into events (and wraps raw lines)") {
    val file = Files.createTempFile("tailev", ".log")
    Files.writeString(file, "{\"n\":\"a\",\"d\":7}\nnot-json\n{\"n\":\"b\",\"d\":\"x\"}\n")
    val q = graft.streaming.StreamCompiler.tailSource(spark, file.toString, startAt = "start")
      .writeStream.format("memory").queryName("tail_ev").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tail_ev").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // unparseable lines are dropped (n is null), like batch replay
      assert(rows == Set(("a", "7"), ("b", "\"x\"")))
    } finally q.stop()

    val wq = graft.streaming.StreamCompiler.tailSource(spark, file.toString,
        startAt = "start", wrapName = Some("w"))
      .writeStream.format("memory").queryName("tail_wrap").start()
    try {
      wq.processAllAvailable()
      val rows = spark.table("tail_wrap").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("w", "\"{\\\"n\\\":\\\"a\\\",\\\"d\\\":7}\""),
        ("w", "\"not-json\""), ("w", "\"{\\\"n\\\":\\\"b\\\",\\\"d\\\":\\\"x\\\"}\"")))
    } finally wq.stop()
  }

  test("spool reader bounds files per trigger (maxFilesPerTrigger)") {
    import org.apache.spark.sql.DataFrame
    val dir = Files.createTempDirectory("spool-rate")
    (1 to 6).foreach(i => Files.writeString(dir.resolve(f"batch-$i%012d.ndjson"),
      s"{\"n\":\"e$i\"}\n"))
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = IngestSources.streamLines(spark, dir.toString, maxFilesPerTrigger = 2)
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) => { val c = b.count(); if (c > 0) sizes.add(c); () })
      .start()
    try q.processAllAvailable() finally q.stop()
    val s = scala.jdk.CollectionConverters.IteratorHasAsScala(sizes.iterator()).asScala.toSeq
    assert(s.sum == 6, s"batches=$s")
    assert(s.max <= 2, s"batches=$s") // one-line files: rows per batch = files per trigger
    assert(s.size >= 3, s"batches=$s")
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
