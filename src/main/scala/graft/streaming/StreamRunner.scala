package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.io.HttpOps
import graft.spec.Spec._

/** Attach a compiled streaming pipeline to live sinks and start the
  * queries. Sink deliveries run in `foreachBatch` — per micro-batch,
  * executor-side for HTTP, driver-side append for stdout/file —
  * mirroring [[graft.pipeline.BatchRunner]]'s delivery placement.
  */
object StreamRunner {

  final case class Running(output: StreamingQuery, sinks: Seq[StreamingQuery],
                           exposeServers: Map[String, graft.sinks.ExposeHttp] = Map.empty,
                           listener: Option[(SparkSession,
                             org.apache.spark.sql.streaming.StreamingQueryListener)] = None) {
    def stopAll(): Unit = {
      sinks.foreach(q => if (q.isActive) q.stop())
      if (output.isActive) output.stop()
      exposeServers.values.foreach(_.stop())
      // spark.streams is session-shared: leaving the listener registered
      // would double-count every micro-batch on the next start() with
      // the same collector
      listener.foreach { case (s, l) => s.streams.removeListener(l) }
    }
  }

  /** Start the pipeline: terminal events go to `outputSink` format
    * ("console", "memory", "noop"); each `send-*` tap becomes its own
    * query delivering per micro-batch.
    *
    * With a `collector`, the in/out flow counters ride along as
    * `observe` aggregates (in on the shared input, out on the terminal
    * output) and its streaming listener — registered here — folds each
    * micro-batch's counts into the process-lifetime counters, the
    * streaming face of the reference's Prometheus flow metrics.
    */
  def start(spark: SparkSession, tpl: PipelineTemplate, input: Dataset[SEvent],
            outputSink: String = "console", queryPrefix: String = "graft",
            triggerMs: Long = 1000,
            httpConf: HttpOps.HttpConf = HttpOps.HttpConf(),
            collector: Option[graft.pipeline.Metrics.Collector] = None): Running = {
    import org.apache.spark.sql.functions.{count, lit}
    collector.foreach(c => spark.streams.addListener(c.streamingListener))
    val observedInput = collector match {
      case Some(_) => input.observe(graft.pipeline.Metrics.InMetric, count(lit(1)).as("events"))
      case None    => input
    }
    val compiled = StreamCompiler.compile(spark, tpl, observedInput)

    import graft.pipeline.BatchCompiler._
    import org.apache.spark.sql.{DataFrame, Row}
    val servers = scala.collection.mutable.LinkedHashMap[String, graft.sinks.ExposeHttp]()
    val sinkQueries = compiled.sinkSpecs.toSeq.map { case (name, spec) =>
      val writer = spec.lines.writeStream
        .queryName(s"$queryPrefix-sink-$name")
        .trigger(Trigger.ProcessingTime(triggerMs))
        .outputMode("append")
      spec.delivery match {
        case ToHttp(target, method, headers) =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            batch.foreachPartition { (it: Iterator[Row]) =>
              it.foreach { r =>
                val body = r.getString(0)
                val resp = HttpOps.send(target, method, headers, body, httpConf)
                if (resp.statusCode() >= 300)
                  graft.pipeline.DeadLetter.record(s"http ${resp.statusCode()}", body)
              }
            }
          }.start()
        case ToFile(path, distributed) =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            if (distributed) batch.write.mode("append").text(path)
            else {
              val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path),
                java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
              try batch.toLocalIterator().forEachRemaining { (r: Row) =>
                w.write(r.getString(0)); w.write('\n')
              } finally w.close()
            }
          }.start()
        case ToRedis(host, port, target, mode) =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            graft.sinks.BrokerSink.deliver(batch,
              graft.sinks.RedisFactory(host, port, target, mode), _ => target)
          }.start()
        case ToAmqp(conf) =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            graft.sinks.AmqpBroker.deliver(batch, conf)
          }.start()
        case ToMqtt(conf) =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            graft.sinks.MqttBroker.deliver(batch, conf)
          }.start()
        case ToExpose(endpoint, port, responses) =>
          // driver-resident ring server, fed per micro-batch — the
          // streaming face of BatchRunner's expose delivery
          val server = new graft.sinks.ExposeHttp(endpoint, port, responses)
          server.start()
          servers(name) = server
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            batch.toLocalIterator().forEachRemaining((r: Row) => server.offer(r.getString(0)))
          }.start()
        case ToStdout =>
          writer.foreachBatch { (batch: DataFrame, _: Long) =>
            batch.toLocalIterator().forEachRemaining((r: Row) => println(r.getString(0)))
          }.start()
      }
    }

    import StreamingWindows.sEventEnc
    val observedOutput = collector match {
      case Some(_) => compiled.output.observe(graft.pipeline.Metrics.OutMetric, count(lit(1)).as("events"))
      case None    => compiled.output
    }
    val out = observedOutput.map(e => StreamCompiler.eventJsonStr(e))(StreamingWindows.stringEnc)
      .writeStream
      .queryName(s"$queryPrefix-out")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .outputMode("append")
      .format(outputSink)
    Running(out.start(), sinkQueries, servers.toMap,
      collector.map(c => spark -> (c.streamingListener:
        org.apache.spark.sql.streaming.StreamingQueryListener)))
  }
}
