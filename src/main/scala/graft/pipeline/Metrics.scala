package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Pipeline flow counters, mirroring the reference's
  * `cdp_pipeline_events_total{flow=incoming|outgoing}` metrics
  * (reference src/metrics.ts:30-74) the Spark-native way: `observe`
  * named aggregates ride along with every action — no second pass
  * over the data — and a QueryExecutionListener accumulates them per
  * pipeline run. Streaming queries report the same observations per
  * micro-batch through StreamingQueryProgress.
  */
object Metrics {

  val InMetric = "graft_pipeline_in"
  val OutMetric = "graft_pipeline_out"

  def observeIn(df: DataFrame): DataFrame =
    df.observe(InMetric, count(lit(1)).as("events"))

  def observeOut(df: DataFrame): DataFrame =
    df.observe(OutMetric, count(lit(1)).as("events"))

  /** Driver-side accumulator fed by a listener; counters survive
    * across actions, like the reference's process-lifetime counters.
    */
  final class Collector {
    private val counts = new java.util.concurrent.ConcurrentHashMap[String, Long]()

    val listener: QueryExecutionListener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val om = qe.observedMetrics
        om.foreach { case (name, row) =>
          if (name.startsWith("graft_")) {
            // cached subtrees re-report the same accumulator value on
            // later actions — high-water merge, not sum, so fan-out
            // re-execution can't double count a run
            counts.merge(name, row.getAs[Long]("events"), (a, b) => math.max(a, b))
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }

    // streaming: per-(query, metric) cumulative sums — each micro-batch
    // reports a batch-local count, so they add up per query; across
    // queries observing the same node (output + sink taps share the
    // observed input) the counter takes the high-water max, same merge
    // rule as the batch listener above
    private val streamCums = new java.util.concurrent.ConcurrentHashMap[(java.util.UUID, String), Long]()

    val streamingListener: org.apache.spark.sql.streaming.StreamingQueryListener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val om = e.progress.observedMetrics
          om.forEach { (name, row) =>
            if (name.startsWith("graft_")) {
              val cum = streamCums.merge((e.progress.id, name), row.getAs[Long]("events"), (a, b) => a + b)
              counts.merge(name, cum, (a, b) => math.max(a, b))
            }
          }
        }
      }

    def snapshot: Map[String, Long] =
      scala.jdk.CollectionConverters.MapHasAsScala(counts).asScala.toMap

    /** Prometheus-style exposition text (one counter per line). */
    def exposition: String =
      snapshot.toSeq.sortBy(_._1).map { case (k, v) =>
        s"# TYPE $k counter\n$k $v"
      }.mkString("", "\n", "\n")
  }

  /** Prometheus exposition over HTTP, mirroring the reference's metrics
    * server (reference src/metrics.ts:187-228, src/conf.ts:190-208):
    * GET on the exposition path returns the counter snapshot as
    * `text/plain; version=0.0.4`; every other method/path is 404. Port
    * and path come from `GRAFT_METRICS_PORT` (default 8001) /
    * `GRAFT_METRICS_PATH` (default `/metrics`, empty string disables —
    * same envelope as the reference's `METRICS_EXPOSITION_*`).
    */
  final class Server(collector: Collector, path: String = "/metrics", port: Int = 8001) {
    private var server: com.sun.net.httpserver.HttpServer = _

    def start(): Int = {
      server = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress(port), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        if (x.getRequestMethod == "GET" && x.getRequestURI.getPath == path) {
          val body = collector.exposition.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          x.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
          x.sendResponseHeaders(200, body.length)
          x.getResponseBody.write(body)
        } else x.sendResponseHeaders(404, -1)
        x.close()
      })
      server.start()
      server.getAddress.getPort
    }

    def boundPort: Int = server.getAddress.getPort

    def stop(): Unit = if (server != null) server.stop(0)
  }

  /** Start the env-configured metrics server, if enabled: path from
    * `GRAFT_METRICS_PATH` (empty disables), port from
    * `GRAFT_METRICS_PORT`.
    */
  def startFromEnv(collector: Collector): Option[Server] = {
    val path = sys.env.getOrElse("GRAFT_METRICS_PATH", "/metrics")
    if (path.isEmpty) None
    else {
      val port = sys.env.get("GRAFT_METRICS_PORT").flatMap(_.toIntOption).getOrElse(8001)
      val s = new Server(collector, path, port)
      // exposition is best-effort observability: a taken port (two
      // concurrent graft runs) must not abort the pipeline run itself
      try Some { s.start(); s }
      catch {
        case e: java.io.IOException =>
          System.err.println(s"metrics: bind to port $port failed (${e.getMessage}); exposition disabled for this run")
          None
      }
    }
  }
}
