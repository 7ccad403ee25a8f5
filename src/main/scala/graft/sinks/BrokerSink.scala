package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** The executor-side delivery shape for brokered sinks (the
  * reference's send-amqp / send-mqtt / send-redis,
  * src/step-functions/send-{amqp,mqtt,redis}.ts): one client
  * connection per partition-task, opened once, reused for every
  * payload in the partition, closed in a finally.
  *
  * No broker client libraries ship in this environment (zero egress),
  * so the concrete clients are pluggable: a production deployment
  * registers an AMQP/MQTT/Redis-backed [[MessageClient.Factory]];
  * tests use the file-backed factory, which exercises the identical
  * lifecycle (connect → publish xN → close) through the identical
  * partition loop.
  */
object BrokerSink {

  /** Minimal client contract shared by all brokered sinks. */
  trait MessageClient extends AutoCloseable {
    def publish(routingKey: String, payload: String): Unit
  }

  object MessageClient {
    /** Serializable constructor shipped to executors. */
    trait Factory extends Serializable {
      def connect(): MessageClient
    }
  }

  /** Deliver every line with a per-partition client. `routingKey` is
    * derived per line (the reference routes by event name or a fixed
    * topic/queue).
    */
  def deliver(lines: DataFrame, factory: MessageClient.Factory,
              routingKey: String => String): Unit = {
    lines.foreachPartition { (it: Iterator[Row]) =>
      val client = factory.connect()
      try it.foreach { r =>
        val payload = r.getString(0)
        client.publish(routingKey(payload), payload)
      } finally client.close()
    }
  }

  /** File-backed test/local factory: publishes append one
    * `routingKey\tpayload` line per message to a per-partition file
    * in `dir` — a faithful stand-in for a broker channel (ordered,
    * connection-scoped, visible after close).
    */
  final case class FileFactory(dir: String) extends MessageClient.Factory {
    override def connect(): MessageClient = new MessageClient {
      private val path = java.nio.file.Paths.get(dir,
        s"part-${java.util.UUID.randomUUID()}.log")
      private val w = {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.newBufferedWriter(path)
      }
      override def publish(routingKey: String, payload: String): Unit = {
        w.write(routingKey); w.write('\t'); w.write(payload); w.write('\n')
      }
      override def close(): Unit = w.close()
    }
  }
}
