package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{BatchCompiler, BatchRunner, Metrics}
import graft.spec.Spec

/** CLI entry point, mirroring the reference's `cdp [-t] pipeline.yaml`
  * (src/index.ts:24-55): parse → envsubst → validate; `--test` stops
  * after validation (config-check mode); otherwise replay the
  * pipeline's file input in batch mode, executing sink deliveries and
  * printing terminal events as NDJSON.
  */
object Main {

  def main(args: Array[String]): Unit = {
    var testOnly = false
    var file: Option[String] = None
    args.foreach {
      case "-t" | "--test" => testOnly = true
      case other           => file = Some(other)
    }
    val path = file.getOrElse {
      System.err.println("usage: graft.Main [-t|--test] <pipeline.yaml>")
      sys.exit(2)
    }

    val text = Spec.envsubst(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    val tpl =
      try Spec.parseYaml(text)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(s"invalid pipeline: ${e.getMessage}")
          sys.exit(1); throw e
      }
    if (testOnly) {
      println(s"pipeline '${tpl.name}' is valid (${tpl.steps.size} steps)")
      return
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(tpl.name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val collector = new Metrics.Collector
    spark.listenerManager.register(collector.listener)
    // Prometheus exposition over HTTP (reference src/metrics.ts:187-228):
    // enabled unless GRAFT_METRICS_PATH is set empty
    val metricsServer = Metrics.startFromEnv(collector)

    try {
      val raw = BatchCompiler.loadInput(spark, tpl, None)
      // persist the stamped input so multi-sink fan-out re-reads the
      // cache and the in-counter observes exactly once
      val stamped = Metrics.observeIn(BatchCompiler.stampInput(
        tpl, raw, lit(System.currentTimeMillis() / 1000.0))).persist()
      val compiled = BatchCompiler.compile(spark, tpl, stamped)
      val result = BatchRunner.run(compiled)
      BatchCompiler.renderNdjson(Metrics.observeOut(compiled.output))
        .collect().foreach(r => println(r.getString(0)))
      System.err.println(collector.exposition)
      result.exposeServers.values.foreach(_.stop())
      stamped.unpersist()
    } finally {
      metricsServer.foreach(_.stop())
      spark.stop()
    }
  }
}
