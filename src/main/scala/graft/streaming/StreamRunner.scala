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

  final case class Running(output: StreamingQuery, sinks: Seq[StreamingQuery]) {
    def stopAll(): Unit = {
      sinks.foreach(q => if (q.isActive) q.stop())
      if (output.isActive) output.stop()
    }
  }

  /** Start the pipeline: terminal events go to `outputSink` format
    * ("console", "memory", "noop"); each `send-*` tap becomes its own
    * query delivering per micro-batch.
    */
  def start(spark: SparkSession, tpl: PipelineTemplate, input: Dataset[SEvent],
            outputSink: String = "console", queryPrefix: String = "graft",
            triggerMs: Long = 1000,
            httpConf: HttpOps.HttpConf = HttpOps.HttpConf()): Running = {
    val compiled = StreamCompiler.compile(spark, tpl, input)

    val sinkQueries = compiled.sinks.toSeq.map { case (name, lines) =>
      val writer = lines.writeStream
        .queryName(s"$queryPrefix-sink-$name")
        .trigger(Trigger.ProcessingTime(triggerMs))
        .outputMode("append")
      val started = name.split("@http:", 2) match {
        case Array(_, spec) =>
          // "<METHOD>:<target>" encoded by the compiler
          val Array(method, target) = spec.split(":", 2)
          writer.foreachBatch { (batch: Dataset[String], _: Long) =>
            batch.foreachPartition { (it: Iterator[String]) =>
              it.foreach { body =>
                val resp = HttpOps.send(target, method, Map.empty, body, httpConf)
                if (resp.statusCode() >= 300)
                  graft.pipeline.DeadLetter.record(s"http ${resp.statusCode()}", body)
              }
            }
          }.start()
        case _ if name.contains(":") => // send-file tap: "step:path"
          val path = name.split(":", 2)(1)
          writer.foreachBatch { (batch: Dataset[String], _: Long) =>
            val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path),
              java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
            try batch.toLocalIterator().forEachRemaining { (l: String) =>
              w.write(l); w.write('\n')
            } finally w.close()
          }.start()
        case _ => // send-stdout tap
          writer.foreachBatch { (batch: Dataset[String], _: Long) =>
            batch.toLocalIterator().forEachRemaining((l: String) => println(l))
          }.start()
      }
      started
    }

    import StreamingWindows.sEventEnc
    val out = compiled.output.map(e => StreamCompiler.eventJsonStr(e))(StreamingWindows.stringEnc)
      .writeStream
      .queryName(s"$queryPrefix-out")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .outputMode("append")
      .format(outputSink)
    Running(out.start(), sinkQueries)
  }
}
