package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{BrokerSink, RedisFactory}
import graft.sources.IngestSources

/** Contract tests for the pure-JVM RESP client, the send-redis
  * delivery path, and the redis ingest consumer — against a scripted
  * RESP server speaking the real wire protocol (list queues, pub/sub,
  * nil replies), so every byte of the protocol implementation is
  * exercised without a redis binary.
  */
class RedisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Minimal scripted redis: RPUSH/LPUSH/LPOP/BLPOP over in-memory
    * queues, PUBLISH recorded, SUBSCRIBE pushes pre-seeded messages
    * then closes (driving the consumer's EOF path).
    */
  final class ScriptedRedis {
    val pushes = new ConcurrentLinkedQueue[(String, String, String)]() // cmd, target, value
    private val queues = new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()
    private val pubSeed = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    private val server = new ServerSocket(0)
    @volatile private var running = true

    def port: Int = server.getLocalPort
    def seedQueue(key: String, vals: String*): Unit =
      queue(key).addAll(java.util.Arrays.asList(vals: _*))
    def seedChannel(ch: String, msgs: String*): Unit = pubSeed.put(ch, msgs)
    def queueContents(key: String): List[String] = {
      val it = queue(key).iterator(); val b = List.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    private def queue(key: String) =
      queues.computeIfAbsent(key, _ => new ConcurrentLinkedQueue[String]())

    def start(): Unit = {
      val t = new Thread(() => {
        try while (running) { val s = server.accept(); serve(s) }
        catch { case _: Exception => () }
      }, "scripted-redis")
      t.setDaemon(true); t.start()
    }
    def stop(): Unit = { running = false; server.close() }

    private def serve(sock: Socket): Unit = {
      val t = new Thread(() => {
        val in = new BufferedInputStream(sock.getInputStream)
        val out = new BufferedOutputStream(sock.getOutputStream)
        def bulk(s: String): Unit = {
          val b = s.getBytes(UTF_8)
          out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b); out.write("\r\n".getBytes(UTF_8))
        }
        try {
          var open = true
          while (open) readCommand(in) match {
            case None => open = false
            case Some(cmd) => cmd.head.toUpperCase match {
              case "RPUSH" =>
                queue(cmd(1)).add(cmd(2)); pushes.add(("RPUSH", cmd(1), cmd(2)))
                out.write(s":${queue(cmd(1)).size}\r\n".getBytes(UTF_8)); out.flush()
              case "LPOP" =>
                if (cmd.length > 2) {
                  // LPOP key count (Redis >= 6.2): array of up to count
                  // elements, nil when the list is empty
                  val want = cmd(2).toInt
                  val got = List.newBuilder[String]
                  var k = 0
                  var more = true
                  while (k < want && more) Option(queue(cmd(1)).poll()) match {
                    case Some(v) => got += v; k += 1
                    case None    => more = false
                  }
                  val vs = got.result()
                  if (vs.isEmpty) out.write("*-1\r\n".getBytes(UTF_8))
                  else {
                    out.write(s"*${vs.length}\r\n".getBytes(UTF_8))
                    vs.foreach(bulk)
                  }
                } else Option(queue(cmd(1)).poll()) match {
                  case Some(v) => bulk(v)
                  case None    => out.write("$-1\r\n".getBytes(UTF_8))
                }
                out.flush()
              case "BLPOP" =>
                Option(queue(cmd(1)).poll()) match {
                  case Some(v) =>
                    out.write("*2\r\n".getBytes(UTF_8)); bulk(cmd(1)); bulk(v)
                  case None => // scripted timeout: immediate nil
                    out.write("*-1\r\n".getBytes(UTF_8))
                }
                out.flush()
              case "PUBLISH" =>
                pushes.add(("PUBLISH", cmd(1), cmd(2)))
                out.write(":1\r\n".getBytes(UTF_8)); out.flush()
              case "SUBSCRIBE" =>
                val ch = cmd(1)
                out.write("*3\r\n".getBytes(UTF_8)); bulk("subscribe"); bulk(ch)
                out.write(":1\r\n".getBytes(UTF_8)); out.flush()
                pubSeed.getOrDefault(ch, Seq.empty).foreach { m =>
                  out.write("*3\r\n".getBytes(UTF_8)); bulk("message"); bulk(ch); bulk(m)
                }
                out.flush()
                open = false // close -> consumer sees EOF and stops
              case other =>
                out.write(s"-ERR unknown command $other\r\n".getBytes(UTF_8)); out.flush()
            }
          }
        } catch { case _: Exception => () }
        finally sock.close()
      })
      t.setDaemon(true); t.start()
    }

    private def readCommand(in: InputStream): Option[Seq[String]] = {
      def line(): String = {
        val sb = new java.io.ByteArrayOutputStream()
        var c = in.read()
        if (c == -1) return null
        while (c != '\r') { sb.write(c); c = in.read() }
        in.read() // \n
        new String(sb.toByteArray, UTF_8)
      }
      val first = in.read()
      if (first == -1) return None
      require(first == '*', s"expected array, got ${first.toChar}")
      val n = line().toInt
      Some((0 until n).map { _ =>
        require(in.read() == '$', "expected bulk string")
        val len = line().toInt
        val buf = in.readNBytes(len)
        in.read(); in.read() // CRLF
        new String(buf, UTF_8)
      })
    }
  }

  private def withServer[A](f: ScriptedRedis => A): A = {
    val srv = new ScriptedRedis
    srv.start()
    try f(srv) finally srv.stop()
  }

  test("RESP client round-trips queue commands, nil replies, errors") {
    withServer { srv =>
      srv.seedQueue("q", "a", "b")
      val c = new RespClient("localhost", srv.port)
      try {
        assert(c.blpop(1, "q") == Some("q" -> "a"))
        assert(c.lpop("q") == Some("b"))
        assert(c.lpop("q") == None)
        assert(c.blpop(1, "q") == None) // scripted immediate timeout
        assert(c.rpush("q", "c") == 1L)
        assert(c.publish("ch", "m") == 1L)
        assert(c.command("BOGUS").isInstanceOf[Resp.Err])
      } finally c.close()
    }
  }

  test("send-redis delivers every line by RPUSH through BrokerSink") {
    withServer { srv =>
      import spark.implicits._
      val lines = (1 to 20).map(i => s"""{"i":$i}""").toDF("line")
      BrokerSink.deliver(lines, RedisFactory("localhost", srv.port, "outq", "rpush"), _ => "outq")
      val delivered = srv.queueContents("outq").toSet
      assert(delivered == (1 to 20).map(i => s"""{"i":$i}""").toSet)
    }
  }

  test("send-redis publish mode delivers to the channel") {
    withServer { srv =>
      import spark.implicits._
      val lines = Seq("x", "y").toDF("line")
      BrokerSink.deliver(lines, RedisFactory("localhost", srv.port, "chan", "publish"), _ => "chan")
      val pubs = {
        val it = srv.pushes.iterator(); val b = List.newBuilder[(String, String, String)]
        while (it.hasNext) b += it.next()
        b.result()
      }
      assert(pubs.filter(_._1 == "PUBLISH").map(_._3).toSet == Set("x", "y"))
      assert(pubs.forall(_._2 == "chan"))
    }
  }

  test("redis ingest drains a queue batch into one spool file") {
    withServer { srv =>
      srv.seedQueue("inq", """{"n":"a"}""", """{"n":"b"}""", """{"n":"c"}""")
      val spool = java.nio.file.Files.createTempDirectory("redis-spool").toString
      val ingest = new IngestSources.RedisIngest("localhost", srv.port, spool)
      val c = new RespClient("localhost", srv.port)
      try {
        assert(ingest.consumeOnce(c, "inq") == 3)
        assert(ingest.consumeOnce(c, "inq") == 0) // drained
      } finally c.close()
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(spool)).toArray
      assert(files.length == 1)
      val content = java.nio.file.Files.readString(files(0).asInstanceOf[java.nio.file.Path])
      assert(content == "{\"n\":\"a\"}\n{\"n\":\"b\"}\n{\"n\":\"c\"}\n")
    }
  }

  test("live redis MicroBatchStream: byte-for-byte differential vs the batch parse on the same corpus payloads") {
    import org.apache.spark.sql.functions._
    withServer { srv =>
      // the same NDJSON event lines the batch replay oracle consumes
      val lines = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(to_json(struct(
          concat(lit("app."), col("event_type")).as("n"),
          struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
        .collect().map(_.getString(0))
      assert(lines.length >= 500, s"corpus too small to exercise multi-batch: ${lines.length}")
      // seed half before start; push the rest after the first drain to
      // prove CONTINUOUS consumption across triggers, not a one-shot read
      val (pre, post) = lines.splitAt(lines.length / 2)
      srv.seedQueue("q", pre: _*)
      val ds = graft.streaming.StreamCompiler.redisQueueSource(
        spark, "localhost", srv.port, "q", maxPerTrigger = 97)
      val q = ds.writeStream.format("memory").queryName("redisstream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        srv.seedQueue("q", post: _*)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("redisstream")
        .select("seq", "n", "d").collect()
        .sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // pop indices are contiguous from 0 (the natural offset), FIFO order
      assert(streamed.map(_._1).toSeq == streamed.indices.map(_.toLong))
      // batch differential: identical payloads through the identical
      // variant-path parse, in queue (= input) order
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
  }

  test("live redis survives a kill/restart: at-most-once, no duplicates, no inventions") {
    import org.apache.spark.sql.functions._
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer { srv =>
      val lines = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(to_json(struct(
          concat(lit("app."), col("event_type")).as("n"),
          struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
        .collect().map(_.getString(0))
      val (wave1, wave2) = lines.splitAt(lines.length / 2)
      val base = java.nio.file.Files.createTempDirectory("graft-redisrestart")
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      def startQuery() = graft.streaming.StreamCompiler.redisQueueSource(
          spark, "localhost", srv.port, "q", maxPerTrigger = 97)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      def got(): Seq[(String, String, Long)] =
        try spark.read.parquet(outDir).select("n", "d", "seq").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        catch { case _: Exception => Seq.empty }
      // first life: drain wave1, kill
      srv.seedQueue("q", wave1: _*)
      val q1 = startQuery()
      try poll("wave1 sunk")(got().size == wave1.length) finally q1.stop()
      // second life: destructive pops mean anything admitted-but-
      // uncommitted at the kill is gone — the contract is NO duplicates
      // and NO inventions, with offsets resuming monotone
      srv.seedQueue("q", wave2: _*)
      val q2 = startQuery()
      try poll("wave2 sunk")(got().size >= lines.length - 97) finally q2.stop()
      val rows = got()
      val expected = {
        import spark.implicits._
        val v = try_parse_json(col("value"))
        spark.createDataset(lines.toSeq).toDF("value")
          .select(try_variant_get(v, "$.n", "string").as("n"),
            to_json(try_variant_get(v, "$.d", "variant")).as("d"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
      }
      // every sunk row is a real corpus line, none delivered twice
      assert(rows.map(t => (t._1, t._2)).toSet.subsetOf(expected))
      assert(rows.map(t => (t._1, t._2)).distinct.size == rows.size,
        "at-most-once must never duplicate a popped element")
      // offsets are strictly monotone with no overlap across the restart
      val seqs = rows.map(_._3).sorted
      assert(seqs.distinct.size == seqs.size)
      // nothing beyond the at-most-once hole is missing: at most one
      // trigger's admission (maxPerTrigger) may be lost at the kill
      assert(rows.size >= lines.length - 97 && rows.size <= lines.length)
    }
  }

  test("redis subscribe loop spools pushed messages until EOF") {
    withServer { srv =>
      srv.seedChannel("events", """{"n":"p"}""", """{"n":"q"}""")
      val spool = java.nio.file.Files.createTempDirectory("redis-sub-spool").toString
      val ingest = new IngestSources.RedisIngest("localhost", srv.port, spool)
      val c = new RespClient("localhost", srv.port)
      try ingest.subscribeLoop(c, "events") finally c.close()
      val lines = java.nio.file.Files.list(java.nio.file.Paths.get(spool)).toArray.toSeq
        .map(p => java.nio.file.Files.readString(p.asInstanceOf[java.nio.file.Path]))
        .flatMap(_.linesIterator).sorted
      assert(lines == Seq("{\"n\":\"p\"}", "{\"n\":\"q\"}"))
    }
  }

  test("send-redis step in a YAML pipeline delivers rendered events") {
    withServer { srv =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      import graft.pipeline.{BatchCompiler, BatchRunner}
      import graft.spec.Spec
      val tpl = Spec.parseYaml(
        s"""name: p
           |steps:
           |  out:
           |    flatmap:
           |      send-redis:
           |        host: localhost
           |        port: ${srv.port}
           |        key: sunk
           |""".stripMargin)
      val input = Seq(("a.b", """{"k":1}"""), ("a.c", """{"k":2}"""))
        .zipWithIndex.map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
        .toDF("n", "d", "__seq", "arrival")
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      BatchRunner.run(BatchCompiler.compile(spark, tpl, stamped))
      val delivered = srv.queueContents("sunk")
      assert(delivered.size == 2)
      assert(delivered.forall(l => l.startsWith("{\"n\":\"a.") && l.contains("\"d\":{\"k\":")))
    }
  }
}
