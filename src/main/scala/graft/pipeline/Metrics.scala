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

    def snapshot: Map[String, Long] =
      scala.jdk.CollectionConverters.MapHasAsScala(counts).asScala.toMap

    /** Prometheus-style exposition text (one counter per line). */
    def exposition: String =
      snapshot.toSeq.sortBy(_._1).map { case (k, v) =>
        s"# TYPE $k counter\n$k $v"
      }.mkString("", "\n", "\n")
  }
}
