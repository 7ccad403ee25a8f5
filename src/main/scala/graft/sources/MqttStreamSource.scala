package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** LIVE MQTT input as a DataSourceV2 `MicroBatchStream` — the
  * continuous-consumption face of the reference's `mqtt` input
  * (reference src/input/mqtt.ts:109-213), where [[IngestSources
  * .MqttIngest]] is the spool-then-replay face sharing the same wire
  * client.
  *
  * A [[BufferedPushStream]]: the driver-side collector subscribes to
  * the topic filter (the reference's default is `cdp/#`) and buffers
  * each PUBLISH payload; offsets are arrival counts. Delivery
  * contract by qos:
  *   - qos 0 — fire-and-forget: admitted-but-uncommitted messages are
  *     lost on crash (at-most-once), exactly the reference consumer.
  *   - qos 1 — at-least-once: the client connects with a CHECKPOINT-
  *     STABLE clientId and `cleanSession = false`, and PUBACKs are
  *     DEFERRED until `commit` (one per packet id — MQTT has no
  *     cumulative ack). Deliveries a crashed run admitted but never
  *     committed stay un-acked in the broker's session state and are
  *     redelivered (DUP) to the next run — the same ack-deferral lever
  *     the reference pulls under backpressure via mqtt.js
  *     handleMessage (src/input/mqtt.ts:143-151), here tied to the
  *     checkpoint like [[AmqpQueueSource]]'s cumulative Basic.Ack.
  *     Ack deferral doubles as flow control: a broker stops pushing
  *     when its in-flight window fills, bounding the driver buffer.
  *   - qos 2 — the wire client completes PUBREC/PUBREL/PUBCOMP on
  *     receipt (exactly-once on the wire, at-most-once vs crashes).
  *
  * Usage: `spark.readStream.format(classOf[MqttStreamSource].getName)
  * .option("host", h).option("port", p).option("topic", "cdp/#")
  * .option("qos", 1).load()` or
  * [[graft.streaming.StreamCompiler.mqttStreamSource]].
  */
class MqttStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BrokerLines.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MqttStreamTable(
      Option(opts.get("host")).getOrElse("127.0.0.1"),
      Option(opts.get("port")).map(_.toInt).getOrElse(1883),
      Option(opts.get("topic")).getOrElse("cdp/#"),
      Option(opts.get("qos")).map(_.toInt).getOrElse(0))
  }
}

private[sources] class MqttStreamTable(host: String, port: Int, topic: String, qos: Int)
    extends Table with SupportsRead {
  require(qos >= 0 && qos <= 2, s"qos must be 0..2, got $qos")

  override def name(): String = s"mqtt($host:$port/$topic)"
  override def schema(): StructType = BrokerLines.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = BrokerLines.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttStream(host, port, topic, qos, checkpointLocation)
      }
    }
}

private[sources] class MqttStream(host: String, port: Int, topic: String, qos: Int,
                                  checkpointLocation: String)
    extends BufferedPushStream {

  @volatile private var client: graft.io.MqttClient = _

  // The session identity must survive restarts for the broker to
  // redeliver un-acked qos-1 in-flights to the NEXT run — derive it
  // from the checkpoint location, the same durable identity the
  // offsets live under. ≤23 chars (the 3.1.1 guaranteed-accept bound).
  private def sessionClientId: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$checkpointLocation|$topic".getBytes("UTF-8"))
    "graft-" + md.take(8).map(b => f"$b%02x").mkString
  }

  override protected def collect(append: (String, Long) => Unit): Unit = {
    val c = new graft.io.MqttClient(host, port,
      clientId = if (qos == 1) sessionClientId else s"graft-${java.util.UUID.randomUUID().toString.take(8)}",
      cleanSession = qos != 1, manualAckQos1 = qos == 1)
    client = c
    c.subscribe(topic, qos)
    var more = true
    while (more) c.nextMessageWithPid() match {
      case Some((_, payload, pid)) => append(payload, pid.toLong)
      case None                    => more = false
    }
  }

  // qos-1 deferred acks: one PUBACK per committed packet id, written
  // on the send side while the collector blocks reading (the client
  // serializes frame writes internally). Tag 0 marks a delivery that
  // arrived WITHOUT a packet id (publisher sent qos 0 on our qos-1
  // subscription — the broker forwards at the lower of the two);
  // MQTT 3.1.1 [MQTT-2.3.1-1] forbids packet id 0 in a PUBACK, so
  // those deliveries are admitted but never acked.
  override protected def onCommitted(trimmedTags: Array[Long]): Unit = {
    val c = client
    if (c != null && qos == 1) {
      try trimmedTags.iterator.filter(_ != 0L).foreach(t => c.ackQos1(t.toInt))
      catch { case _: Exception => () } // broker gone: redelivery handles it
    }
  }

  override protected def closeClient(): Unit = {
    val c = client
    client = null
    if (c != null) c.close()
  }
}
