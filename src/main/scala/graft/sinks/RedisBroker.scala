package graft.sinks

import graft.io.RespClient

/** Concrete Redis client factory for [[BrokerSink]] — the engine's
  * `send-redis` (reference src/step-functions/send-redis.ts:100-191):
  * each partition-task opens one RESP connection, pushes every payload
  * (RPUSH onto a list queue, or PUBLISH to a pub/sub channel), and
  * closes it. The routing key passed by the sink loop is ignored in
  * favor of the configured target, like the reference's fixed
  * queue/channel option.
  */
final case class RedisFactory(host: String, port: Int, target: String,
                              mode: String, db: Int = 0,
                              passwordEnv: Option[String] = None)
    extends BrokerSink.MessageClient.Factory {
  require(Set("rpush", "publish").contains(mode),
    s"redis mode must be rpush or publish, got $mode")

  override def connect(): BrokerSink.MessageClient = new BrokerSink.MessageClient {
    private val c = new RespClient(host, port)
    passwordEnv.flatMap(sys.env.get).foreach(c.auth)
    if (db != 0) c.select(db)
    override def publish(routingKey: String, payload: String): Unit = mode match {
      case "rpush"   => c.rpush(target, payload)
      case "publish" => c.publish(target, payload)
    }
    override def close(): Unit = c.close()
  }
}
