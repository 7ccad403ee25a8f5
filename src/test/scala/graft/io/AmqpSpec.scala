package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IngestSources

/** Contract tests for the pure-JVM AMQP 0-9-1 client, the send-amqp
  * delivery path, and the amqp ingest consumer — against a scripted
  * AMQP frame server (handshake, topology assertion, deliveries,
  * publishes with basic-properties), so every frame of the protocol
  * subset is exercised without a broker binary. Golden byte tests pin
  * the codec independently so symmetric client/server bugs can't
  * cancel out.
  */
class AmqpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  final case class RecordedPublish(exchange: String, routingKey: String,
                                   props: Amqp.BasicProps, body: String)

  /** Minimal scripted AMQP broker: full 0-9-1 handshake, records
    * declares/binds/consumes/acks/publishes, pushes seeded deliveries
    * after Basic.Consume (then closes, driving the consumer EOF path).
    */
  final class ScriptedAmqp {
    val exchanges = new ConcurrentLinkedQueue[(String, String, Int)]() // name, type, bits
    val queues = new ConcurrentLinkedQueue[(String, Int, Seq[(String, Any)])]()
    val binds = new ConcurrentLinkedQueue[(String, String, String)]()
    val acks = new ConcurrentLinkedQueue[java.lang.Long]()
    val recovers = new ConcurrentLinkedQueue[java.lang.Boolean]()
    val publishes = new ConcurrentLinkedQueue[RecordedPublish]()
    @volatile var seeded: Seq[String] = Seq.empty
    @volatile var startOkMechanism: String = _
    @volatile var startOkResponse: Array[Byte] = _

    // live-delivery face for the streaming-source tests: deliveryTags
    // continue monotone after any seeded wave; the frame writer is
    // lock-guarded so a test-thread delivery can't interleave with a
    // serve-thread reply
    val delivered = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile private var liveDeliverFn: (Long, String) => Unit = _
    val consumeCount = new java.util.concurrent.atomic.AtomicInteger(0)
    def consumerAttached: Boolean = liveDeliverFn != null
    def deliverLive(msgs: Seq[String]): Unit = {
      val d = liveDeliverFn
      require(d != null, "no consumer attached yet")
      msgs.foreach(m => d(delivered.incrementAndGet(), m))
    }

    // un-acked delivery ledger, the real broker behavior the
    // at-least-once restart test depends on: a consumer connection
    // dying requeues everything it was delivered but never acked, and
    // the next Basic.Consume gets it redelivered (fresh tags,
    // redelivered=1) ahead of new messages
    private val unacked = new java.util.concurrent.ConcurrentSkipListMap[Long, String]()
    private[AmqpSpec] def recordDelivery(tag: Long, body: String): Unit =
      unacked.put(tag, body)
    private[AmqpSpec] def recordAck(tag: Long, multiple: Boolean): Unit =
      if (multiple) unacked.headMap(tag, true).clear() else unacked.remove(tag)
    private[AmqpSpec] def requeued(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val vs = unacked.values.asScala.toSeq
      unacked.clear()
      vs
    }

    private val server = new ServerSocket(0)
    @volatile private var running = true
    def port: Int = server.getLocalPort

    def start(): Unit = {
      val t = new Thread(() => {
        try while (running) { val s = server.accept(); serve(s) }
        catch { case _: Exception => () }
      }, "scripted-amqp")
      t.setDaemon(true); t.start()
    }
    def stop(): Unit = { running = false; server.close() }

    private def serve(sock: Socket): Unit = {
      val t = new Thread(() => {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

        val writeLock = new Object
        def frame(tpe: Int, channel: Int, payload: Array[Byte]): Unit =
          writeLock.synchronized {
            out.writeByte(tpe); out.writeShort(channel)
            out.writeInt(payload.length); out.write(payload); out.writeByte(0xce)
            out.flush()
          }
        def method(channel: Int, classId: Int, methodId: Int, args: Array[Byte]): Unit =
          frame(1, channel, new Amqp.Writer().u16(classId).u16(methodId).bytes ++ args)
        def readFrame(): (Int, Int, Array[Byte]) = {
          val tpe = in.read()
          if (tpe == -1) throw new EOFException()
          val ch = in.readUnsignedShort()
          val payload = in.readNBytes(in.readInt())
          require(in.readUnsignedByte() == 0xce, "bad frame end")
          (tpe, ch, payload)
        }
        def deliverFlagged(tag: Long, body: String, redelivered: Boolean): Unit =
          writeLock.synchronized {
            // lock held across all three frames so a concurrent reply
            // can't interleave mid-delivery
            recordDelivery(tag, body)
            method(1, 60, 60, new Amqp.Writer().shortstr("ctag-1").u64(tag)
              .u8(if (redelivered) 1 else 0).shortstr("cdp").shortstr("k").bytes)
            val hw = new Amqp.Writer().u16(60).u16(0)
              .u64(body.getBytes(UTF_8).length.toLong)
            Amqp.writeProps(hw, Amqp.BasicProps(contentType = Some("text/plain")))
            frame(2, 1, hw.bytes)
            frame(3, 1, body.getBytes(UTF_8))
          }
        def deliver(tag: Long, body: String): Unit = deliverFlagged(tag, body, redelivered = false)

        try {
          val header = in.readNBytes(8)
          require(new String(header.take(4), UTF_8) == "AMQP", "bad protocol header")
          // Connection.Start
          method(0, 10, 10, new Amqp.Writer().u8(0).u8(9)
            .table(Seq.empty).longstr("PLAIN").longstr("en_US").bytes)
          var open = true
          var publishPending: Option[(String, String)] = None
          var headerPending: Option[(String, String, Amqp.BasicProps, Long)] = None
          val bodyAcc = new java.io.ByteArrayOutputStream()
          while (open) {
            val (tpe, _, payload) = readFrame()
            tpe match {
              case 1 =>
                val r = new Amqp.Reader(payload)
                (r.u16(), r.u16()) match {
                  case (10, 11) => // StartOk
                    r.table()
                    startOkMechanism = r.shortstr()
                    startOkResponse = r.longstrBytes()
                    method(0, 10, 30, new Amqp.Writer().u16(0).u32(131072L).u16(0).bytes)
                  case (10, 31) => () // TuneOk
                  case (10, 40) => method(0, 10, 41, new Amqp.Writer().shortstr("").bytes)
                  case (10, 50) => method(0, 10, 51, Array.empty); open = false
                  case (20, 10) => method(1, 20, 11, new Amqp.Writer().longstr("").bytes)
                  case (20, 40) => method(1, 20, 41, Array.empty)
                  case (40, 10) =>
                    r.u16()
                    val name = r.shortstr(); val tpe2 = r.shortstr(); val bits = r.u8()
                    exchanges.add((name, tpe2, bits))
                    method(1, 40, 11, Array.empty)
                  case (50, 10) =>
                    r.u16()
                    val name = r.shortstr(); val bits = r.u8(); val args = r.table()
                    val q = if (name.isEmpty) "amq.gen-test" else name
                    queues.add((q, bits, args))
                    method(1, 50, 11, new Amqp.Writer().shortstr(q).u32(0).u32(0).bytes)
                  case (50, 20) =>
                    r.u16()
                    binds.add((r.shortstr(), r.shortstr(), r.shortstr()))
                    method(1, 50, 21, Array.empty)
                  case (60, 20) =>
                    method(1, 60, 21, new Amqp.Writer().shortstr("ctag-1").bytes)
                    // dead-consumer requeue: redeliver what a previous
                    // connection left un-acked, fresh tags, ahead of news
                    requeued().foreach(m =>
                      deliverFlagged(delivered.incrementAndGet(), m, redelivered = true))
                    seeded.foreach(m => deliver(delivered.incrementAndGet(), m))
                    liveDeliverFn = deliver
                    consumeCount.incrementAndGet()
                  case (60, 80) =>
                    val tag = r.u64()
                    acks.add(tag)
                    recordAck(tag, multiple = r.u8() != 0)
                    // after the last ack, close: drives consumer EOF
                    if (acks.size == seeded.size && seeded.nonEmpty) open = false
                  case (60, 110) =>
                    recovers.add(r.u8() != 0)
                    method(1, 60, 111, Array.empty)
                  case (60, 40) =>
                    r.u16()
                    publishPending = Some((r.shortstr(), r.shortstr()))
                  case other => fail(s"scripted server got unexpected method $other")
                }
              case 2 =>
                val r = new Amqp.Reader(payload)
                r.u16(); r.u16()
                val size = r.u64()
                val props = Amqp.readProps(r)
                val (ex, rk) = publishPending.get
                if (size == 0) publishes.add(RecordedPublish(ex, rk, props, ""))
                else headerPending = Some((ex, rk, props, size))
                bodyAcc.reset()
              case 3 =>
                bodyAcc.write(payload)
                headerPending.foreach { case (ex, rk, props, size) =>
                  if (bodyAcc.size() >= size) {
                    publishes.add(RecordedPublish(ex, rk, props,
                      new String(bodyAcc.toByteArray, UTF_8)))
                    headerPending = None
                  }
                }
              case 8 => ()
            }
          }
        } catch { case _: Exception => () }
        finally sock.close()
      })
      t.setDaemon(true); t.start()
    }
  }

  private def withServer[A](f: ScriptedAmqp => A): A = {
    val srv = new ScriptedAmqp
    srv.start()
    try f(srv) finally srv.stop()
  }

  private def drain[A](q: ConcurrentLinkedQueue[A]): List[A] = {
    val it = q.iterator(); val b = List.newBuilder[A]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def awaitSize(q: ConcurrentLinkedQueue[_], n: Int, ms: Int = 3000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (q.size < n && System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(q.size >= n, s"expected $n recorded entries, got ${q.size}")
  }

  // ---- codec goldens (pin the wire encoding independently of the
  //      scripted server, which shares the codec) ----

  test("codec: shortstr/longstr/table/props bytes match the 0-9-1 spec layout") {
    val w = new Amqp.Writer().shortstr("ab").longstr("cd")
    assert(w.bytes.toSeq == Seq[Byte](2, 'a', 'b', 0, 0, 0, 2, 'c', 'd'))

    val t = new Amqp.Writer().table(Seq("x-max-priority" -> 5)).bytes
    // longstr len (4) + shortstr key (1+14) + type 'I' (1) + int32 (4)
    assert(t.length == 4 + 15 + 1 + 4)
    assert(t.toSeq.take(4) == Seq[Byte](0, 0, 0, 20))
    assert(t(4) == 14.toByte) // key length
    assert(new String(t.slice(5, 19), UTF_8) == "x-max-priority")
    assert(t(19) == 'I'.toByte)
    assert(t.toSeq.takeRight(4) == Seq[Byte](0, 0, 0, 5))

    val hw = new Amqp.Writer()
    Amqp.writeProps(hw, Amqp.BasicProps(
      contentType = Some("a"), deliveryMode = Some(2), priority = Some(3),
      expiration = Some("9"), timestamp = Some(7L)))
    val flags = ((hw.bytes(0) & 0xff) << 8) | (hw.bytes(1) & 0xff)
    assert(flags == ((1 << 15) | (1 << 12) | (1 << 11) | (1 << 8) | (1 << 6)))
    // content-type shortstr "a", mode 2, prio 3, expiration "9", ts long 7
    assert(hw.bytes.drop(2).toSeq ==
      Seq[Byte](1, 'a', 2, 3, 1, '9', 0, 0, 0, 0, 0, 0, 0, 7))

    // round-trip through the reader
    val rt = Amqp.readProps(new Amqp.Reader(hw.bytes))
    assert(rt == Amqp.BasicProps(Some("a"), Some(2), Some(3), Some("9"), Some(7L)))
  }

  test("client handshakes with NUL-separated PLAIN credentials") {
    withServer { srv =>
      val c = new AmqpClient("localhost", srv.port, user = "u1", password = "p1")
      c.close()
      assert(srv.startOkMechanism == "PLAIN")
      assert(srv.startOkResponse.toSeq ==
        (Array[Byte](0) ++ "u1".getBytes(UTF_8) ++ Array[Byte](0) ++ "p1".getBytes(UTF_8)).toSeq)
    }
  }

  test("amqp ingest asserts topology (defaults) and consumes with ack") {
    withServer { srv =>
      srv.seeded = Seq("""{"n":"a"}""", """{"n":"b"}""", """{"n":"c"}""")
      val spool = java.nio.file.Files.createTempDirectory("amqp-spool").toString
      val ingest = new IngestSources.AmqpIngest(spool)
      val c = new AmqpClient("localhost", srv.port)
      try {
        val q = ingest.assertTopology(c,
          queueArgs = Seq("x-message-ttl" -> 60000, "x-dead-letter-exchange" -> "dlx"))
        assert(q == "amq.gen-test")
        assert(ingest.consumeLoop(c, q) == 3)
      } finally c.close()

      // defaults: exchange cdp/topic durable (bit 2), binding pattern '#'
      assert(drain(srv.exchanges) == List(("cdp", "topic", 2)))
      val (qname, qbits, qargs) = drain(srv.queues).head
      assert(qname == "amq.gen-test" && (qbits & 2) == 2)
      assert(qargs == Seq("x-message-ttl" -> 60000, "x-dead-letter-exchange" -> "dlx"))
      assert(drain(srv.binds) == List(("amq.gen-test", "cdp", "#")))
      awaitSize(srv.acks, 3)
      assert(drain(srv.acks).map(_.toLong) == List(1L, 2L, 3L))

      val lines = java.nio.file.Files.list(java.nio.file.Paths.get(spool)).toArray.toSeq
        .map(p => java.nio.file.Files.readString(p.asInstanceOf[java.nio.file.Path]))
        .flatMap(_.linesIterator).sorted
      assert(lines == Seq("""{"n":"a"}""", """{"n":"b"}""", """{"n":"c"}"""))
    }
  }

  test("client recover round-trips (backpressure-release path)") {
    withServer { srv =>
      val c = new AmqpClient("localhost", srv.port)
      try {
        c.basicRecover(requeue = true)
        assert(drain(srv.recovers) == List(true))
      } finally c.close()
    }
  }

  test("send-amqp step publishes one NDJSON message per vector with reference properties") {
    withServer { srv =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      import graft.pipeline.{BatchCompiler, BatchRunner}
      import graft.spec.Spec
      val tpl = Spec.parseYaml(
        s"""name: p
           |window-key: global
           |steps:
           |  out:
           |    window:
           |      events: 2
           |    reduce:
           |      send-amqp:
           |        host: localhost
           |        port: ${srv.port}
           |        persistent: true
           |        priority: 3
           |        expiration: 60000
           |""".stripMargin)
      val input = Seq(("a.b", """{"k":1}"""), ("a.c", """{"k":2}"""))
        .zipWithIndex.map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
        .toDF("n", "d", "__seq", "arrival")
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      BatchRunner.run(BatchCompiler.compile(spark, tpl, stamped))

      awaitSize(srv.publishes, 1)
      val p = drain(srv.publishes).head
      assert(p.exchange == "cdp")
      assert(p.routingKey == "cdp") // topic-exchange default
      assert(p.props.contentType == Some("application/x-ndjson"))
      assert(p.props.deliveryMode == Some(2)) // persistent
      assert(p.props.priority == Some(3))
      assert(p.props.expiration == Some("60000"))
      assert(p.props.timestamp == Some(1001L)) // max event ts, truncated
      val bodyLines = p.body.linesIterator.filter(_.nonEmpty).toSeq
      assert(bodyLines.size == 2)
      assert(bodyLines.forall(l => l.startsWith("{\"n\":\"a.") && l.contains("\"d\":{\"k\":")))
    }
  }

  test("streaming send-amqp publishes vector messages per micro-batch with event-time stamps") {
    withServer { srv =>
      import graft.model.TracePoint
      import graft.spec.Spec
      import graft.streaming.{SEvent, StreamRunner}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingWindows.sEventEnc
      val tpl = Spec.parseYaml(
        s"""name: sp
           |steps:
           |  out:
           |    window:
           |      events: 2
           |    reduce:
           |      send-amqp:
           |        host: localhost
           |        port: ${srv.port}
           |""".stripMargin)
      val mem = MemoryStream[SEvent]
      val running = StreamRunner.start(spark, tpl, mem.toDS(),
        outputSink = "noop", triggerMs = 100)
      try {
        mem.addData(
          SEvent("a.b", """{"k":1}""", Seq(TracePoint(1001.0, "t", "h")), 1001.0, 1),
          SEvent("a.b", """{"k":2}""", Seq(TracePoint(1002.5, "t", "h")), 1002.5, 2))
        awaitSize(srv.publishes, 1, ms = 15000)
        val p = drain(srv.publishes).head
        assert(p.exchange == "cdp" && p.routingKey == "cdp")
        assert(p.props.contentType == Some("application/x-ndjson"))
        assert(p.props.timestamp == Some(1002L)) // max event ts, truncated
        assert(p.body.linesIterator.count(_.nonEmpty) == 2)
      } finally running.stopAll()
    }
  }

  test("send-amqp jq mode publishes strings as text/plain and objects as json") {
    withServer { srv =>
      import graft.sinks.AmqpBroker
      import spark.implicits._
      val lines = Seq("\"plain string\"", """{"x":1}""").toDF("line")
      AmqpBroker.deliver(lines.coalesce(1),
        AmqpBroker.Conf("localhost", srv.port, exchangeType = "fanout",
          ndjson = false))
      awaitSize(srv.publishes, 2)
      val ps = drain(srv.publishes)
      assert(ps.forall(_.routingKey == "")) // fanout default routing key
      val byBody = ps.map(p => p.body -> p.props.contentType).toMap
      assert(byBody("plain string") == Some("text/plain"))
      assert(byBody("""{"x":1}""") == Some("application/json"))
    }
  }

  test("live amqp MicroBatchStream: batch-parse differential in two waves, cumulative ack on commit") {
    import org.apache.spark.sql.functions._
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer { srv =>
      // the same NDJSON event lines the batch replay oracle consumes
      val lines = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(to_json(struct(
          concat(lit("app."), col("event_type")).as("n"),
          struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
        .collect().map(_.getString(0))
      assert(lines.length >= 500, s"corpus too small: ${lines.length}")
      val (pre, post) = lines.splitAt(lines.length / 2)
      val ds = graft.streaming.StreamCompiler.amqpQueueSource(
        spark, "localhost", srv.port, "q")
      val q = ds.writeStream.format("memory").queryName("amqpstream")
        .outputMode("append").start()
      try {
        // two delivery waves after the consumer attaches: proves
        // CONTINUOUS push consumption across triggers, not a one-shot
        def sunk(): Long =
          try spark.table("amqpstream").count() catch { case _: Exception => -1L }
        poll("consumer attach")(srv.consumerAttached)
        srv.deliverLive(pre)
        poll("first wave")(sunk() == pre.length)
        srv.deliverLive(post)
        poll("second wave")(sunk() == lines.length)
        q.processAllAvailable()
        // the at-least-once contract: checkpoint commits become
        // cumulative Basic.Acks. The engine commits a batch at the
        // start of the NEXT cycle, so a parse-filtered `{}` sentinel
        // drives the trigger that acks the full real corpus.
        srv.deliverLive(Seq("{}"))
        poll("cumulative ack covering the corpus") {
          val it = srv.acks.iterator()
          var max = 0L
          while (it.hasNext) max = math.max(max, it.next())
          max >= lines.length.toLong
        }
      } finally q.stop()
      val streamed = spark.table("amqpstream")
        .select("seq", "n", "d").collect()
        .sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // arrival indices are contiguous from 0, delivery order
      assert(streamed.map(_._1).toSeq == streamed.indices.map(_.toLong))
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

  test("live amqp survives a kill/restart: un-acked deliveries requeue, coverage is at-least-once") {
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
      val base = java.nio.file.Files.createTempDirectory("graft-amqprestart")
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      def startQuery() =
        graft.streaming.StreamCompiler.amqpQueueSource(spark, "localhost", srv.port, "q")
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
      def sunk(): Long =
        try spark.read.parquet(outDir).count() catch { case _: Exception => -1L }
      // first life: one wave fully sunk, then KILL. The ack lag means a
      // tail of wave1 is delivered-but-un-acked at the kill — exactly
      // what the broker must requeue.
      val q1 = startQuery()
      try {
        poll("first consumer")(srv.consumeCount.get() == 1)
        srv.deliverLive(wave1)
        poll("wave1 sunk")(sunk() == wave1.length)
      } finally q1.stop()
      // second life: the reconnect redelivers the un-acked tail ahead of
      // wave2; the checkpoint resumes the offset count monotonically
      val q2 = startQuery()
      try {
        poll("second consumer")(srv.consumeCount.get() == 2)
        srv.deliverLive(wave2)
        val expectDistinct = {
          import spark.implicits._
          val v = try_parse_json(col("value"))
          spark.createDataset(lines.toSeq).toDF("value")
            .select(try_variant_get(v, "$.n", "string").as("n"),
              to_json(try_variant_get(v, "$.d", "variant")).as("d"))
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
        }
        poll("full coverage", ms = 60000) {
          val got = try spark.read.parquet(outDir).select("n", "d").collect()
            .map(r => (r.getString(0), r.getString(1))).toSet
          catch { case _: Exception => Set.empty[(String, String)] }
          got == expectDistinct
        }
      } finally q2.stop()
      // at-least-once, not exactly-once: duplicates are allowed but only
      // from the requeued tail, and every duplicate must BE a corpus line
      val all = spark.read.parquet(outDir).select("n", "d").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(all.size >= lines.length)
      assert(all.size <= lines.length + wave1.length,
        "duplication must be bounded by the requeued first-life deliveries")
    }
  }
}
