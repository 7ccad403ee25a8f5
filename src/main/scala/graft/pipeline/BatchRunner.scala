package graft.pipeline

import org.apache.spark.sql.Row

import graft.io.HttpOps
import graft.sinks.ExposeHttp

/** Execute a compiled batch pipeline's sink deliveries.
  *
  * Delivery placement follows the reference's topology mapped to
  * Spark: stdout and expose-http are driver-side (ordered, bounded),
  * file append is a driver-side ordered append (the reference appends
  * to one file), HTTP posting runs on the executors via
  * `foreachPartition` with the bounded per-JVM connection gate of
  * [[graft.io.HttpOps]].
  */
object BatchRunner {

  final case class RunResult(exposeServers: Map[String, ExposeHttp])

  def run(compiled: BatchCompiler.Compiled,
          httpConf: HttpOps.HttpConf = HttpOps.HttpConf()): RunResult = {
    val servers = scala.collection.mutable.LinkedHashMap[String, ExposeHttp]()
    compiled.sinkSpecs.foreach { case (name, BatchCompiler.SinkSpec(lines, delivery)) =>
      delivery match {
        case BatchCompiler.ToStdout =>
          lines.toLocalIterator().forEachRemaining((r: Row) => println(r.getString(0)))

        case BatchCompiler.ToFile(path, distributed) =>
          if (distributed)
            // executors write a part-file directory — no driver drain
            lines.write.mode("overwrite").text(path)
          else {
            val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path),
              java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
            try lines.toLocalIterator().forEachRemaining { (r: Row) =>
              w.write(r.getString(0)); w.write('\n')
            } finally w.close()
          }

        case BatchCompiler.ToHttp(target, method, headers) =>
          lines.foreachPartition { (it: Iterator[Row]) =>
            it.foreach { r =>
              val resp = HttpOps.send(target, method, headers, r.getString(0), httpConf)
              if (resp.statusCode() >= 300)
                DeadLetter.record(s"http ${resp.statusCode()}", r.getString(0))
            }
          }

        case BatchCompiler.ToExpose(endpoint, port, responses) =>
          val server = new ExposeHttp(endpoint, port, responses)
          server.start()
          lines.toLocalIterator().forEachRemaining((r: Row) => server.offer(r.getString(0)))
          servers(name) = server

        case BatchCompiler.ToRedis(host, port, target, mode) =>
          graft.sinks.BrokerSink.deliver(lines,
            graft.sinks.RedisFactory(host, port, target, mode), _ => target)

        case BatchCompiler.ToAmqp(conf) =>
          graft.sinks.AmqpBroker.deliver(lines, conf)

        case BatchCompiler.ToMqtt(conf) =>
          graft.sinks.MqttBroker.deliver(lines, conf)
      }
    }
    RunResult(servers.toMap)
  }
}

/** Dead-letter capture (reference src/dead-letter.ts:19-32): events
  * that could not be delivered are logged and optionally forwarded to
  * `GRAFT_DEAD_LETTER_TARGET`; failures of the dead-letter forward
  * itself are swallowed (best effort, like the reference).
  */
object DeadLetter {
  def record(reason: String, payload: String): Unit = {
    System.err.println(s"[dead-letter] $reason: ${payload.take(500)}")
    sys.env.get("GRAFT_DEAD_LETTER_TARGET").foreach { target =>
      try HttpOps.send(target, "POST", Map.empty, payload)
      catch { case _: Exception => () }
    }
  }
}
