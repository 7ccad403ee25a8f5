package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

import graft.io.{Amqp, AmqpClient}

/** send-amqp delivery (reference src/step-functions/send-amqp.ts:
  * 127-264): each partition-task opens one AMQP connection, asserts
  * the exchange, publishes every payload, and closes.
  *
  * Reference publish semantics reproduced:
  *   - routing key defaults by exchange type: direct→"cdp",
  *     fanout→"", topic→"cdp" (send-amqp.ts:137-141);
  *   - without jq: one message per vector, NDJSON body,
  *     content-type application/x-ndjson, timestamp = max event
  *     timestamp (send-amqp.ts:223-238);
  *   - with jq: one message per result; JSON-string results are sent
  *     unquoted as text/plain, everything else as application/json
  *     with a wall-clock timestamp (send-amqp.ts:196-216);
  *   - expiration / priority / persistent (delivery-mode 2) publish
  *     options (send-amqp.ts:143-167).
  */
object AmqpBroker {

  final case class Conf(host: String, port: Int,
                        exchange: String = "cdp", exchangeType: String = "topic",
                        durable: Boolean = true, autoDelete: Boolean = false,
                        routingKey: Option[String] = None,
                        expiration: Option[Long] = None,
                        priority: Option[Int] = None,
                        persistent: Option[Boolean] = None,
                        /** true = NDJSON vector bodies with a `__vts`
                          * column; false = jq result lines. */
                        ndjson: Boolean = true) extends Serializable {
    def resolvedRoutingKey: String = routingKey.getOrElse(
      Map("direct" -> "cdp", "fanout" -> "", "topic" -> "cdp")(exchangeType))
  }

  /** Publish options shared by every message of a delivery. */
  private def baseProps(conf: Conf): Amqp.BasicProps = Amqp.BasicProps(
    deliveryMode = conf.persistent.map(p => if (p) 2 else 1),
    priority = conf.priority,
    expiration = conf.expiration.map(_.toString))

  /** `lines` columns: (line) for jq mode, (line, __vts) for NDJSON
    * vector mode.
    */
  def deliver(lines: DataFrame, conf: Conf): Unit = {
    val hasTs = lines.columns.contains("__vts")
    lines.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val c = new AmqpClient(conf.host, conf.port)
        try {
          c.exchangeDeclare(conf.exchange, conf.exchangeType, conf.durable, conf.autoDelete)
          val rk = conf.resolvedRoutingKey
          it.foreach { r =>
            val line = r.getString(0)
            val (body, ctype, ts) =
              if (conf.ndjson) {
                val vts = if (hasTs) r.getDouble(1).toLong
                          else System.currentTimeMillis() / 1000
                (line + "\n", "application/x-ndjson", vts)
              } else {
                val now = System.currentTimeMillis() / 1000
                decodeJqResult(line) match {
                  case Some(s) => (s, "text/plain", now)
                  case None    => (line, "application/json", now)
                }
              }
            c.basicPublish(conf.exchange, rk,
              body.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              baseProps(conf).copy(contentType = Some(ctype), timestamp = Some(ts)))
          }
        } finally c.close()
      }
    }
  }

  /** A jq result line that is a bare JSON string decodes to its value
    * (reference sends strings unquoted as text/plain); anything else
    * is passed through as JSON.
    */
  private[sinks] def decodeJqResult(line: String): Option[String] = {
    val t = line.trim
    if (!t.startsWith("\"")) None
    else
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
        if (node.isTextual) Some(node.asText) else None
      } catch { case _: Exception => None }
  }
}
