package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IngestSources

/** Contract tests for the pure-JVM MQTT 3.1.1 client, the send-mqtt
  * delivery path, and the mqtt ingest consumer — against a scripted
  * MQTT broker (CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH with qos
  * 0/1 + PUBACK), so every packet of the protocol subset is exercised
  * without a broker binary.
  */
class MqttSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  final case class RecordedPublish(topic: String, qos: Int, payload: String)

  /** Broker-side MQTT 3.1.1 session state for a persistent
    * (cleanSession=false) client: the packet-id counter and the
    * un-PUBACKed qos>0 deliveries, which §4.4 obliges the broker to
    * redeliver (DUP) when the same clientId reconnects.
    */
  final class BrokerSession {
    var pid: Int = 100
    val outstanding = new java.util.LinkedHashMap[Int, (String, String)]()
  }

  final class ScriptedMqtt(deliverQos: Int = 0) {
    val subscriptions = new ConcurrentLinkedQueue[(String, Int)]()
    val publishes = new ConcurrentLinkedQueue[RecordedPublish]()
    val pubacks = new ConcurrentLinkedQueue[java.lang.Integer]()
    val pubrels = new ConcurrentLinkedQueue[java.lang.Integer]()
    val pubcomps = new ConcurrentLinkedQueue[java.lang.Integer]()
    val subscribeCount = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var seeded: Seq[(String, String)] = Seq.empty // topic -> payload
    @volatile var clientId: String = _

    // persistent-session store (clientId -> session), surviving
    // connection death exactly like a real broker's session state
    val sessions = new java.util.concurrent.ConcurrentHashMap[String, BrokerSession]()
    def outstandingCount(cid: String): Int = {
      val s = sessions.get(cid)
      if (s == null) 0 else s.synchronized(s.outstanding.size)
    }

    // live-delivery face for the streaming-source tests (publish on the
    // open connection after SUBSCRIBE, at deliverQos)
    @volatile private var liveDeliverFn: (String, String) => Unit = _
    def consumerAttached: Boolean = liveDeliverFn != null
    def deliverLive(msgs: Seq[(String, String)]): Unit = {
      val d = liveDeliverFn
      require(d != null, "no subscriber attached yet")
      msgs.foreach { case (t, p) => d(t, p) }
    }

    // mixed-qos face: a publisher that sent at qos 0 is forwarded at
    // qos 0 (min of publish and subscription qos) — a PUBLISH frame
    // with NO packet id even on a qos-1 subscription
    @volatile private var liveDeliverQos0Fn: (String, String) => Unit = _
    def deliverLiveQos0(msgs: Seq[(String, String)]): Unit = {
      val d = liveDeliverQos0Fn
      require(d != null, "no subscriber attached yet")
      msgs.foreach { case (t, p) => d(t, p) }
    }

    private val server = new ServerSocket(0)
    @volatile private var running = true
    def port: Int = server.getLocalPort

    def start(): Unit = {
      val t = new Thread(() => {
        try while (running) { val s = server.accept(); serve(s) }
        catch { case _: Exception => () }
      }, "scripted-mqtt")
      t.setDaemon(true); t.start()
    }
    def stop(): Unit = { running = false; server.close() }

    private def serve(sock: Socket): Unit = {
      val t = new Thread(() => {
        val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
        val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
        val writeLock = new Object
        def packet(tpe: Int, flags: Int, body: Array[Byte]): Unit =
          writeLock.synchronized {
            out.writeByte((tpe << 4) | flags)
            Mqtt.writeRemainingLength(out, body.length)
            out.write(body); out.flush()
          }
        def str16(b: Array[Byte], off: Int): (String, Int) = {
          val n = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
          (new String(b, off + 2, n, UTF_8), off + 2 + n)
        }
        try {
          var open = true
          var session: BrokerSession = null // set on CONNECT
          while (open) {
            val h = in.read()
            if (h == -1) throw new EOFException()
            val len = Mqtt.readRemainingLength(in)
            val body = in.readNBytes(len)
            val tpe = (h >> 4) & 0xf
            val flags = h & 0xf
            tpe match {
              case Mqtt.Connect =>
                // variable header: "MQTT", level, flags, keepalive = 10 bytes
                val cleanSess = (body(7) & 0x02) != 0
                val (cid, _) = str16(body, 10)
                clientId = cid
                session =
                  if (cleanSess) new BrokerSession // discarded with the socket
                  else sessions.computeIfAbsent(cid, _ => new BrokerSession)
                packet(Mqtt.Connack, 0, Array[Byte](0, 0))
              case Mqtt.Subscribe =>
                val spid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
                val (filter, off) = str16(body, 2)
                val qos = body(off) & 0xff
                subscriptions.add((filter, qos))
                packet(Mqtt.Suback, 0, Array[Byte]((spid >> 8).toByte, (spid & 0xff).toByte,
                  math.min(qos, deliverQos).toByte))
                val sess = session
                def frame(topic: String, payload: String, pid: Int, dup: Boolean): Unit = {
                  val vh = new java.io.ByteArrayOutputStream()
                  vh.write(Mqtt.utf8(topic))
                  if (deliverQos > 0) { vh.write(pid >> 8); vh.write(pid & 0xff) }
                  packet(Mqtt.Publish, (deliverQos << 1) | (if (dup) 0x8 else 0),
                    vh.toByteArray ++ payload.getBytes(UTF_8))
                }
                def pubDeliver(topic: String, payload: String): Unit =
                  writeLock.synchronized { // pid mutation + frame, one unit
                    var pid = 0
                    if (deliverQos > 0) sess.synchronized {
                      sess.pid += 1; pid = sess.pid
                      sess.outstanding.put(pid, (topic, payload))
                    }
                    frame(topic, payload, pid, dup = false)
                  }
                // §4.4: a resumed session's un-acked deliveries go out
                // again first, flagged DUP, with their ORIGINAL pids
                writeLock.synchronized {
                  sess.synchronized {
                    sess.outstanding.forEach { (pid, tp) =>
                      frame(tp._1, tp._2, pid, dup = true)
                    }
                  }
                }
                seeded.foreach { case (topic, payload) => pubDeliver(topic, payload) }
                liveDeliverFn = pubDeliver
                liveDeliverQos0Fn = (topic, payload) => writeLock.synchronized {
                  val vh = new java.io.ByteArrayOutputStream()
                  vh.write(Mqtt.utf8(topic))
                  packet(Mqtt.Publish, 0, vh.toByteArray ++ payload.getBytes(UTF_8))
                }
                subscribeCount.incrementAndGet()
                if (seeded.nonEmpty && deliverQos == 0) open = false
              case Mqtt.Puback =>
                val apid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
                pubacks.add(apid)
                if (session != null) session.synchronized {
                  session.outstanding.remove(apid)
                }
                if (pubacks.size == seeded.size) open = false
              case Mqtt.Publish =>
                val qos = (flags >> 1) & 0x3
                val (topic, off0) = str16(body, 0)
                var off = off0
                var ppid = 0
                if (qos > 0) { ppid = ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff); off += 2 }
                publishes.add(RecordedPublish(topic, qos,
                  new String(body, off, body.length - off, UTF_8)))
                if (qos == 1)
                  packet(Mqtt.Puback, 0, Array[Byte]((ppid >> 8).toByte, (ppid & 0xff).toByte))
                else if (qos == 2)
                  packet(Mqtt.Pubrec, 0, Array[Byte]((ppid >> 8).toByte, (ppid & 0xff).toByte))
              case Mqtt.Pubrel => // publisher completing its qos-2 send
                val rpid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
                pubrels.add(rpid)
                packet(Mqtt.Pubcomp, 0, Array[Byte]((rpid >> 8).toByte, (rpid & 0xff).toByte))
              case Mqtt.Pubrec => // subscriber acking our qos-2 delivery
                packet(Mqtt.Pubrel, 0x2, Array[Byte](body(0), body(1)))
              case Mqtt.Pubcomp =>
                pubcomps.add(((body(0) & 0xff) << 8) | (body(1) & 0xff))
                if (pubcomps.size == seeded.size) open = false
              case Mqtt.Unsubscribe =>
                val upid = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
                packet(Mqtt.Unsuback, 0, Array[Byte]((upid >> 8).toByte, (upid & 0xff).toByte))
              case Mqtt.Disconnect => open = false
              case Mqtt.Pingreq => packet(Mqtt.Pingresp, 0, Array.empty)
              case _ => ()
            }
          }
        } catch { case _: Exception => () }
        finally sock.close()
      })
      t.setDaemon(true); t.start()
    }
  }

  private def withServer[A](deliverQos: Int = 0)(f: ScriptedMqtt => A): A = {
    val srv = new ScriptedMqtt(deliverQos)
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

  test("remaining-length codec round-trips the spec boundary values") {
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455)) {
      val bos = new java.io.ByteArrayOutputStream()
      Mqtt.writeRemainingLength(new DataOutputStream(bos), n)
      val back = Mqtt.readRemainingLength(
        new DataInputStream(new java.io.ByteArrayInputStream(bos.toByteArray)))
      assert(back == n, s"round-trip of $n")
      // spec: 1 byte up to 127, 2 up to 16383, 3 up to 2097151, else 4
      val expectBytes = if (n <= 127) 1 else if (n <= 16383) 2 else if (n <= 2097151) 3 else 4
      assert(bos.toByteArray.length == expectBytes)
    }
  }

  test("mqtt ingest subscribes to the default filter and spools qos-0 messages") {
    withServer() { srv =>
      srv.seeded = Seq("t/a" -> """{"n":"a"}""", "t/b" -> """{"n":"b"}""")
      val spool = java.nio.file.Files.createTempDirectory("mqtt-spool").toString
      val ingest = new IngestSources.MqttIngest(spool)
      val c = new MqttClient("localhost", srv.port, clientId = "graft-test")
      try assert(ingest.subscribeLoop(c) == 2) finally c.close()
      assert(srv.clientId == "graft-test")
      assert(drain(srv.subscriptions) == List(("cdp/#", 0))) // reference default topic
      val lines = java.nio.file.Files.list(java.nio.file.Paths.get(spool)).toArray.toSeq
        .map(p => java.nio.file.Files.readString(p.asInstanceOf[java.nio.file.Path]))
        .flatMap(_.linesIterator).sorted
      assert(lines == Seq("""{"n":"a"}""", """{"n":"b"}"""))
    }
  }

  test("qos-1 deliveries are acked by the consumer") {
    withServer(deliverQos = 1) { srv =>
      srv.seeded = Seq("t/a" -> "m1", "t/b" -> "m2")
      val spool = java.nio.file.Files.createTempDirectory("mqtt-q1-spool").toString
      val ingest = new IngestSources.MqttIngest(spool)
      val c = new MqttClient("localhost", srv.port)
      try assert(ingest.subscribeLoop(c, "t/#", qos = 1) == 2) finally c.close()
      awaitSize(srv.pubacks, 2)
      assert(drain(srv.pubacks).map(_.toInt) == List(101, 102))
    }
  }

  test("send-mqtt step publishes one NDJSON message per vector to the default topic") {
    withServer() { srv =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      import graft.pipeline.{BatchCompiler, BatchRunner}
      import graft.spec.Spec
      val tpl = Spec.parseYaml(
        s"""name: pipe
           |window-key: global
           |steps:
           |  out:
           |    window:
           |      events: 2
           |    reduce:
           |      send-mqtt:
           |        host: localhost
           |        port: ${srv.port}
           |        qos: 1
           |""".stripMargin)
      val input = Seq(("a.b", """{"k":1}"""), ("a.c", """{"k":2}"""))
        .zipWithIndex.map { case ((n, d), i) => (n, d, i.toLong, 1000.0 + i) }
        .toDF("n", "d", "__seq", "arrival")
      val stamped = BatchCompiler.stampInput(tpl, input, col("arrival"))
      BatchRunner.run(BatchCompiler.compile(spark, tpl, stamped))

      awaitSize(srv.publishes, 1)
      val p = drain(srv.publishes).head
      assert(p.topic == "cdp/pipe/out") // cdp/<pipeline>/<step> default
      assert(p.qos == 1)
      val bodyLines = p.payload.linesIterator.filter(_.nonEmpty).toSeq
      assert(bodyLines.size == 2)
      assert(bodyLines.forall(l => l.startsWith("{\"n\":\"a.") && l.contains("\"d\":{\"k\":")))
    }
  }

  test("qos-2 publish runs the full PUBREC/PUBREL/PUBCOMP handshake") {
    withServer() { srv =>
      import graft.sinks.MqttBroker
      import spark.implicits._
      val lines = Seq("""{"a":1}""", """{"b":2}""").toDF("line")
      MqttBroker.deliver(lines.coalesce(1),
        MqttBroker.Conf("localhost", srv.port, topic = "t2", qos = 2, ndjson = false))
      awaitSize(srv.publishes, 2)
      awaitSize(srv.pubrels, 2)
      val ps = drain(srv.publishes)
      assert(ps.forall(_.qos == 2))
      assert(ps.map(_.payload).toSet == Set("""{"a":1}""", """{"b":2}"""))
      // one PUBREL per publish, matching packet ids 1, 2
      assert(drain(srv.pubrels).map(_.toInt).sorted == List(1, 2))
    }
  }

  test("qos-2 deliveries complete the receiver-side handshake") {
    withServer(deliverQos = 2) { srv =>
      srv.seeded = Seq("t/a" -> "m1", "t/b" -> "m2")
      val spool = java.nio.file.Files.createTempDirectory("mqtt-q2-spool").toString
      val ingest = new IngestSources.MqttIngest(spool)
      val c = new MqttClient("localhost", srv.port)
      try assert(ingest.subscribeLoop(c, "t/#", qos = 2) == 2) finally c.close()
      awaitSize(srv.pubcomps, 2)
      assert(drain(srv.pubcomps).map(_.toInt) == List(101, 102))
    }
  }

  test("streaming send-mqtt delivers vector messages per micro-batch") {
    withServer() { srv =>
      import graft.model.TracePoint
      import graft.spec.Spec
      import graft.streaming.{SEvent, StreamRunner}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.StreamingWindows.sEventEnc
      val tpl = Spec.parseYaml(
        s"""name: spipe
           |steps:
           |  out:
           |    window:
           |      events: 2
           |    reduce:
           |      send-mqtt:
           |        host: localhost
           |        port: ${srv.port}
           |""".stripMargin)
      val mem = MemoryStream[SEvent]
      val running = StreamRunner.start(spark, tpl, mem.toDS(),
        outputSink = "noop", triggerMs = 100)
      try {
        mem.addData(
          SEvent("a.b", """{"k":1}""", Seq(TracePoint(1001.0, "t", "h")), 1001.0, 1),
          SEvent("a.b", """{"k":2}""", Seq(TracePoint(1002.0, "t", "h")), 1002.0, 2))
        awaitSize(srv.publishes, 1, ms = 15000)
        val p = drain(srv.publishes).head
        assert(p.topic == "cdp/spipe/out")
        assert(p.payload.linesIterator.count(_.nonEmpty) == 2)
      } finally running.stopAll()
    }
  }

  test("send-mqtt jq mode publishes strings unquoted") {
    withServer() { srv =>
      import graft.sinks.MqttBroker
      import spark.implicits._
      val lines = Seq("\"plain string\"", """{"x":1}""").toDF("line")
      MqttBroker.deliver(lines.coalesce(1),
        MqttBroker.Conf("localhost", srv.port, topic = "t", qos = 0, ndjson = false))
      awaitSize(srv.publishes, 2)
      val ps = drain(srv.publishes)
      assert(ps.map(_.payload).toSet == Set("plain string", """{"x":1}"""))
      assert(ps.forall(_.topic == "t"))
    }
  }

  test("live mqtt MicroBatchStream at qos 1: checkpoint commits drive the deferred PUBACKs") {
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer(1) { srv =>
      val msgs = (1 to 120).map(i => s"""{"n":"q$i","d":$i}""")
      val ds = graft.streaming.StreamCompiler.mqttStreamSource(
        spark, "localhost", srv.port, topic = "cdp/#", qos = 1)
      val q = ds.writeStream.format("memory").queryName("mqttq1stream")
        .outputMode("append").start()
      try {
        def sunk(): Long =
          try spark.table("mqttq1stream").count() catch { case _: Exception => -1L }
        poll("subscriber attach")(srv.consumerAttached)
        srv.deliverLive(msgs.map(("cdp/ev", _)))
        poll("wave sunk")(sunk() == msgs.length)
        // qos-1 contract: PUBACKs are deferred to checkpoint commits,
        // which trail the sink by one micro-batch — a parse-filtered
        // `{}` sentinel drives the trigger that commits (and so acks)
        // the full real corpus
        srv.deliverLive(Seq(("cdp/ev", "{}")))
        poll("deferred PUBACKs cover the corpus")(srv.pubacks.size >= msgs.length)
        // and the acked packet ids are exactly the delivered ones
        // (first 120 session pids), not blind counters
        val ackedSet = drain(srv.pubacks).map(_.toInt).toSet
        assert((101 to 100 + msgs.length).forall(ackedSet.contains))
      } finally q.stop()
      val got = spark.table("mqttq1stream").select("n").collect().map(_.getString(0)).sorted
      assert(got.toSeq == msgs.indices.map(i => s"q${i + 1}").sorted)
    }
  }

  test("live mqtt qos 1 with a mixed-qos publisher: qos-0 deliveries are admitted but never PUBACKed (no packet id 0 on the wire)") {
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer(1) { srv =>
      val ds = graft.streaming.StreamCompiler.mqttStreamSource(
        spark, "localhost", srv.port, topic = "cdp/#", qos = 1)
      val q = ds.writeStream.format("memory").queryName("mqttmixedqos")
        .outputMode("append").start()
      try {
        def sunk(): Long =
          try spark.table("mqttmixedqos").count() catch { case _: Exception => -1L }
        poll("subscriber attach")(srv.consumerAttached)
        // interleave: qos-1 (pid'd), qos-0 (NO pid — publisher sent
        // qos 0; the broker forwards at min(pub, sub) = 0), qos-1
        srv.deliverLive(Seq(("cdp/ev", """{"n":"a","d":1}""")))
        srv.deliverLiveQos0(Seq(("cdp/ev", """{"n":"b","d":2}""")))
        srv.deliverLive(Seq(("cdp/ev", """{"n":"c","d":3}""")))
        poll("all three sunk")(sunk() == 3)
        // sentinel drives the trigger whose commit acks the corpus
        srv.deliverLive(Seq(("cdp/ev", "{}")))
        poll("qos-1 PUBACKs arrive")(srv.pubacks.size >= 2)
        val acked = drain(srv.pubacks).map(_.toInt)
        // MQTT 3.1.1 [MQTT-2.3.1-1]: packet id 0 must never appear in
        // a PUBACK — the qos-0 delivery is admitted, not acked
        assert(!acked.contains(0), s"protocol violation: PUBACK with packet id 0 (acked=$acked)")
        assert(acked.toSet.subsetOf((101 to 104).toSet))
        val got = spark.table("mqttmixedqos").select("n").collect().map(_.getString(0)).toSet
        assert(Set("a", "b", "c").subsetOf(got))
      } finally q.stop()
    }
  }

  test("live mqtt qos 1 survives a kill/restart: un-acked in-flights redeliver (DUP), coverage is at-least-once") {
    import org.apache.spark.sql.functions._
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer(1) { srv =>
      // the same NDJSON event corpus as the sibling broker differentials
      val lines = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(to_json(struct(
          concat(lit("app."), col("event_type")).as("n"),
          struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
        .collect().map(_.getString(0))
      val (wave1, wave2) = lines.splitAt(lines.length / 2)
      val base = java.nio.file.Files.createTempDirectory("graft-mqttrestart")
      val outDir = base.resolve("out").toString
      val ckpt = base.resolve("ckpt").toString
      def startQuery() =
        graft.streaming.StreamCompiler.mqttStreamSource(
            spark, "localhost", srv.port, topic = "cdp/#", qos = 1)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
      def sunk(): Long =
        try spark.read.parquet(outDir).count() catch { case _: Exception => -1L }
      // first life: wave1 fully sunk, then KILL. Deferred acks trail
      // the sink by a micro-batch, so a tail of wave1 is
      // delivered-but-un-PUBACKed at the kill — broker session state
      // must hold it for redelivery.
      val q1 = startQuery()
      val unackedAtKill = try {
        poll("first subscriber")(srv.subscribeCount.get() == 1)
        srv.deliverLive(wave1.map(("cdp/ev", _)))
        poll("wave1 sunk")(sunk() == wave1.length)
        srv.outstandingCount(srv.clientId)
      } finally q1.stop()
      assert(unackedAtKill > 0,
        "kill must catch qos-1 deliveries in flight, or the differential proves nothing")
      // second life: SAME clientId (checkpoint-derived) resumes the
      // session; the un-acked tail redelivers (DUP) ahead of wave2
      val q2 = startQuery()
      try {
        poll("second subscriber")(srv.subscribeCount.get() == 2)
        srv.deliverLive(wave2.map(("cdp/ev", _)))
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
      // at-least-once, not exactly-once: duplicates allowed, but ONLY
      // from the redelivered un-acked first-life tail
      val all = spark.read.parquet(outDir).select("n", "d").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(all.size >= lines.length)
      assert(all.size <= lines.length + unackedAtKill,
        "duplication must be bounded by the un-PUBACKed deliveries at the kill")
    }
  }

  test("live mqtt MicroBatchStream: batch-parse differential in two waves") {
    import org.apache.spark.sql.functions._
    def poll(what: String, ms: Int = 30000)(ok: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + ms
      while (!ok) {
        if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
        Thread.sleep(50)
      }
    }
    withServer() { srv =>
      // the same NDJSON event lines the batch replay oracle consumes
      val lines = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
        .select(to_json(struct(
          concat(lit("app."), col("event_type")).as("n"),
          struct(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")).as("d"))).as("value"))
        .collect().map(_.getString(0))
      assert(lines.length >= 500, s"corpus too small: ${lines.length}")
      val (pre, post) = lines.splitAt(lines.length / 2)
      val ds = graft.streaming.StreamCompiler.mqttStreamSource(
        spark, "localhost", srv.port, topic = "cdp/#", qos = 0)
      val q = ds.writeStream.format("memory").queryName("mqttstream")
        .outputMode("append").start()
      try {
        def sunk(): Long =
          try spark.table("mqttstream").count() catch { case _: Exception => -1L }
        // two publish waves after SUBSCRIBE: proves continuous push
        // consumption across triggers, not a one-shot read
        poll("subscriber attach")(srv.consumerAttached)
        srv.deliverLive(pre.map(("cdp/ev", _)))
        poll("first wave")(sunk() == pre.length)
        srv.deliverLive(post.map(("cdp/ev", _)))
        poll("second wave")(sunk() == lines.length)
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("mqttstream")
        .select("seq", "n", "d").collect()
        .sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // arrival indices are contiguous from 0, publish order
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
}
