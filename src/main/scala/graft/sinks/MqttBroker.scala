package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

import graft.io.MqttClient

/** send-mqtt delivery (reference src/step-functions/send-mqtt.ts:
  * 86-185): each partition-task opens one MQTT connection and
  * publishes every payload to a fixed topic.
  *
  * Reference semantics reproduced:
  *   - default topic `cdp/<pipeline>/<step>` (send-mqtt.ts:74-75),
  *     resolved at compile time;
  *   - qos 0 default, qos 1 waits for PUBACK per message, qos 2 runs
  *     the full PUBREC/PUBREL/PUBCOMP handshake per message;
  *   - without jq: one message per vector (NDJSON body);
  *   - with jq: one message per result (strings unquoted — the
  *     content-type distinction is an MQTT 5 property with no 3.1.1
  *     equivalent; see [[graft.io.Mqtt]]).
  */
object MqttBroker {

  final case class Conf(host: String, port: Int, topic: String,
                        qos: Int = 0,
                        /** true = NDJSON vector bodies; false = jq lines. */
                        ndjson: Boolean = true) extends Serializable

  def deliver(lines: DataFrame, conf: Conf): Unit = {
    lines.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = new MqttClient(conf.host, conf.port)
        try it.foreach { r =>
          val line = r.getString(0)
          val body =
            if (conf.ndjson) line + "\n"
            else AmqpBroker.decodeJqResult(line).getOrElse(line)
          c.publish(conf.topic, body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            conf.qos)
        } finally c.close()
      }
    }
  }
}
