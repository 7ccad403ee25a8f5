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
  * contract: qos 0 is fire-and-forget; at qos 1/2 the wire client
  * completes the protocol handshake on receipt, so once buffered a
  * message is this process's responsibility — admitted-but-uncommitted
  * messages are lost on crash (at-most-once from the checkpoint's
  * point of view), exactly the reference consumer's semantics. MQTT
  * has no consumer-side cumulative ack to defer, so there is no
  * commit hook to strengthen this (that is AMQP's trick,
  * [[AmqpQueueSource]]).
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
          new MqttStream(host, port, topic, qos)
      }
    }
}

private[sources] class MqttStream(host: String, port: Int, topic: String, qos: Int)
    extends BufferedPushStream {

  @volatile private var client: graft.io.MqttClient = _

  override protected def collect(append: (String, Long) => Unit): Unit = {
    val c = new graft.io.MqttClient(host, port)
    client = c
    c.subscribe(topic, qos)
    var n = 0L
    var more = true
    while (more) c.nextMessage() match {
      case Some((_, payload)) => append(payload, n); n += 1
      case None               => more = false
    }
  }

  override protected def closeClient(): Unit = {
    val c = client
    client = null
    if (c != null) c.close()
  }
}
