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

  private def pollUntil(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!ok) {
      if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
      Thread.sleep(50)
    }
  }

  /** The query's source checkpoint dir is `<ckpt>/sources/<i>` — find
    * the ephemeral port the live http source registered under it.
    */
  private def boundPort(ckpt: String): Option[Int] = {
    val it = HttpPushSource.boundPorts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.contains(ckpt)) return Some(e.getValue.intValue())
    }
    None
  }

  test("live http push MicroBatchStream: batch-parse differential in two waves") {
    import org.apache.spark.sql.functions._
    // the same NDJSON event corpus as the broker differentials
    val lines = Tables.events(spark, "/root/testdata/sf0.001")
      .select(to_json(struct(
        concat(lit("app."), col("event_type")).as("n"),
        struct(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
      .collect().map(_.getString(0))
    assert(lines.length >= 500, s"corpus too small: ${lines.length}")
    val (pre, post) = lines.splitAt(lines.length / 2)
    val ckpt = Files.createTempDirectory("graft-httppush-ckpt").toString
    val ds = graft.streaming.StreamCompiler.httpPushSource(spark, port = 0)
    val q = ds.writeStream.format("memory").queryName("httppushstream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      def sunk(): Long =
        try spark.table("httppushstream").count() catch { case _: Exception => -1L }
      pollUntil("endpoint up")(boundPort(ckpt).isDefined)
      val port = boundPort(ckpt).get
      pollUntil("healthz")(try {
        val c = java.net.http.HttpClient.newHttpClient()
        c.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:$port/healthz")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode() == 200
      } catch { case _: Exception => false })
      // two POST waves after the server is up: proves continuous push
      // admission across triggers, not a one-shot read
      pre.grouped(1000).foreach(b =>
        assert(this.post(port, "/events", b.mkString("", "\n", "\n")) == 200))
      pollUntil("first wave")(sunk() == pre.length)
      post.grouped(1000).foreach(b =>
        assert(this.post(port, "/events", b.mkString("", "\n", "\n")) == 200))
      pollUntil("second wave")(sunk() == lines.length)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("httppushstream")
      .select("seq", "n", "d").collect()
      .sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val batch = {
      import spark.implicits._
      val v = try_parse_json(col("value"))
      spark.createDataset(lines.toSeq).toDF("value")
        .select(
          try_variant_get(v, "$.n", "string").as("n"),
          to_json(try_variant_get(v, "$.d", "variant")).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1)))
    }
    assert(streamed.length == batch.length)
    assert(streamed.map(t => (t._2, t._3)).toSeq == batch.toSeq,
      "streamed (n, d) must equal the batch parse byte-for-byte in arrival order")
  }

  test("live http push responds 503 while the uncommitted backlog is at the cap") {
    val ckpt = Files.createTempDirectory("graft-http503-ckpt").toString
    val ds = graft.streaming.StreamCompiler.httpPushSource(spark, port = 0,
      maxBuffered = 50)
    // a long trigger keeps the first wave's lines UNSERVED (no
    // micro-batch takes them for 60 s), so the backlog
    // deterministically exceeds the cap for the second POST
    val q = ds.writeStream.format("memory").queryName("http503stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("60 seconds"))
      .outputMode("append").start()
    try {
      pollUntil("endpoint up")(boundPort(ckpt).isDefined)
      val port = boundPort(ckpt).get
      val wave = (1 to 100).map(i => s"""{"n":"a.x","d":$i}""").mkString("", "\n", "\n")
      pollUntil("first POST accepted")(post(port, "/events", wave) == 200)
      // backlog is now 100 admitted / 0 committed >= cap 50
      assert(post(port, "/events", """{"n":"a.y","d":0}""") == 503)
      // and unknown paths 404 like the reference
      assert(post(port, "/other", "{}") == 404)
    } finally q.stop()
  }

  test("live http push soak: 8 concurrent posters with 503-retry, zero loss, zero duplication") {
    import org.apache.spark.sql.functions.col
    // the reference endpoint serves concurrent clients
    // (src/input/http.ts:90-165); this hammers the embedded server +
    // BufferedPushStream append path from 8 threads against a TINY
    // backlog cap, so senders constantly trip the 503 backpressure
    // face and retry — the contract is that retries converge with
    // every line admitted exactly once (a 200 is the only accept)
    val ckpt = Files.createTempDirectory("graft-httpsoak-ckpt").toString
    val ds = graft.streaming.StreamCompiler.httpPushSource(spark, port = 0,
      maxBuffered = 256)
    val q = ds.writeStream.format("memory").queryName("httpsoakstream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .outputMode("append").start()
    try {
      pollUntil("endpoint up")(boundPort(ckpt).isDefined)
      val port = boundPort(ckpt).get
      val senders = 8
      val perSender = 400
      val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (0 until senders).map { t =>
        val th = new Thread(() => {
          try {
            val mine = (0 until perSender).map(i => s"""{"n":"a.soak","d":${t * perSender + i}}""")
            mine.grouped(32).foreach { chunk =>
              val body = chunk.mkString("", "\n", "\n")
              var code = -1
              var tries = 0
              while (code != 200 && tries < 2000) {
                code = try post(port, "/events", body)
                  catch { case _: Exception => -1 }
                if (code != 200) {
                  if (code == 503) rejected.incrementAndGet()
                  Thread.sleep(10)
                }
                tries += 1
              }
              if (code != 200) failures.add(s"sender $t gave up (last=$code)")
            }
          } catch { case e: Exception => failures.add(s"sender $t: $e") }
        }, s"soak-sender-$t")
        th.start(); th
      }
      threads.foreach(_.join(120000))
      assert(failures.isEmpty, failures.toString)
      val total = senders * perSender
      def sunk(): Long =
        try spark.table("httpsoakstream").count() catch { case _: Exception => -1L }
      pollUntil("soak corpus fully sunk", ms = 60000)(sunk() == total)
      // exactly-once admission: all ids present, no id twice
      val ids = spark.table("httpsoakstream")
        .select(col("d").cast("long"))
        .collect().map(_.getLong(0))
      assert(ids.length == total)
      assert(ids.toSet == (0 until total).map(_.toLong).toSet,
        "every posted line admitted exactly once")
      info(s"soak complete: $total lines from $senders senders, ${rejected.get()} 503 rejections retried")
    } finally q.stop()
  }

  test("live http push caps body size: 413 over maxBodyBytes, driver heap protected") {
    val ckpt = Files.createTempDirectory("graft-http413-ckpt").toString
    val ds = spark.readStream.format(classOf[HttpPushSource].getName)
      .option("port", "0").option("maxBodyBytes", "64").load()
    val q = ds.writeStream.format("memory").queryName("http413stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      pollUntil("endpoint up")(boundPort(ckpt).isDefined)
      val port = boundPort(ckpt).get
      assert(post(port, "/events", """{"n":"a.x"}""") == 200)          // under the cap
      assert(post(port, "/events", "x" * 100) == 413)                  // over the cap
      assert(post(port, "/events", """{"n":"a.y"}""") == 200)          // still serving
      pollUntil("admitted lines sunk")(
        (try spark.table("http413stream").count() catch { case _: Exception => -1L }) == 2)
    } finally q.stop()
  }

  test("live http push survives a kill/restart: offsets resume monotone, no duplicates") {
    import org.apache.spark.sql.functions._
    val wave1 = (1 to 40).map(i => s"""{"n":"a.w1","d":$i}""")
    val wave2 = (41 to 80).map(i => s"""{"n":"a.w2","d":$i}""")
    val base = Files.createTempDirectory("graft-httprestart")
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def startQuery() =
      graft.streaming.StreamCompiler.httpPushSource(spark, port = 0)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
    def sunk(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Exception => -1L }
    val q1 = startQuery()
    try {
      pollUntil("first endpoint")(boundPort(ckpt).isDefined)
      val port = boundPort(ckpt).get
      wave1.grouped(10).foreach(b =>
        assert(post(port, "/events", b.mkString("", "\n", "\n")) == 200))
      pollUntil("wave1 sunk")(sunk() == wave1.length)
    } finally q1.stop()
    HttpPushSource.boundPorts.clear() // fresh registry so the second bind is observed
    // second life: a NEW server binds, the checkpoint resumes the
    // arrival count — wave2 lands after wave1 with no replay of the
    // already-committed range (at-most-once across the kill, like the
    // reference's checkpointless queue, but with monotone offsets)
    val q2 = startQuery()
    try {
      pollUntil("second endpoint")(boundPort(ckpt).isDefined)
      val port2 = boundPort(ckpt).get
      wave2.grouped(10).foreach(b =>
        assert(post(port2, "/events", b.mkString("", "\n", "\n")) == 200))
      pollUntil("wave2 sunk")(sunk() == wave1.length + wave2.length)
    } finally q2.stop()
    val got = spark.read.parquet(outDir).select("d").collect()
      .map(_.getString(0)).sorted
    val expect = (wave1 ++ wave2).map(l =>
      l.substring(l.lastIndexOf(':') + 1, l.length - 1)).sorted
    assert(got.toSeq == expect.toSeq, "exactly the two waves, no duplicates, no loss")
  }

  test("live poll source: ETag dedup holds across triggers AND across a restart") {
    import org.apache.spark.sql.functions._
    val bodyA = (1 to 10).map(i => s"""{"n":"a.p","d":{"i":$i}}""").mkString("", "\n", "\n")
    val bodyB = (11 to 20).map(i => s"""{"n":"a.q","d":{"i":$i}}""").mkString("", "\n", "\n")
    @volatile var body = bodyA
    @volatile var etag = "\"v1\""
    val gets = new java.util.concurrent.atomic.AtomicInteger(0)
    // the server IGNORES If-None-Match and always 200s with an ETag —
    // forcing the source's client-side equivalence check (the
    // reference's only mechanism, poll.ts:123-146) to do the dedup
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/feed", (x: HttpExchange) => {
      gets.incrementAndGet()
      val b = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("ETag", etag)
      x.sendResponseHeaders(200, b.length)
      x.getResponseBody.write(b)
      x.close()
    })
    server.start()
    val target = s"http://localhost:${server.getAddress.getPort}/feed"
    val base = Files.createTempDirectory("graft-pollstream")
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    def startQuery() =
      graft.streaming.StreamCompiler.pollSource(spark, target, intervalMs = 50)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
    def sunk(): Long =
      try spark.read.parquet(outDir).count() catch { case _: Exception => -1L }
    try {
      // first life: body A admitted once, then re-polled without
      // re-admission (same ETag)
      val q1 = startQuery()
      try {
        pollUntil("body A sunk")(sunk() == 10)
        val seen = gets.get()
        pollUntil("several more polls")(gets.get() >= seen + 3)
        assert(sunk() == 10, "equal-ETag re-polls must admit nothing")
      } finally q1.stop()
      // second life, same checkpoint: the ETag rides the offset, so
      // the restarted query must NOT re-admit body A
      val q2 = startQuery()
      try {
        val seen = gets.get()
        pollUntil("restarted query polls")(gets.get() >= seen + 2)
        assert(sunk() == 10, "restart must not re-admit the ETag-known body")
        body = bodyB
        etag = "\"v2\""
        pollUntil("body B sunk")(sunk() == 20)
      } finally q2.stop()
    } finally server.stop(0)
    // exactly the two bodies, no duplicates, batch-parse differential
    val got = spark.read.parquet(outDir).select("n", "d").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.size == 20)
    val expect = {
      import spark.implicits._
      val v = try_parse_json(col("value"))
      spark.createDataset((bodyA + bodyB).linesIterator.toSeq).toDF("value")
        .select(try_variant_get(v, "$.n", "string").as("n"),
          to_json(try_variant_get(v, "$.d", "variant")).as("d"))
        .collect().map(r => (r.getString(0), r.getString(1)))
    }
    assert(got.sorted == expect.toSeq.sorted)
  }
}
