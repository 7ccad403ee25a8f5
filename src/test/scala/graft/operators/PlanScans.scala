package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test helper: all file scans in an executed plan, unwrapping the
  * AQE nodes a plain `.collect` stops at.
  */
object PlanScans {

  def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: QueryStageExec        => allScans(q.plan)
    case s: FileSourceScanExec    => Seq(s)
    case other => other.children.flatMap(allScans)
  }

  def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    allScans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))

  /** Every physical node, unwrapping AQE wrappers — for shape pins
    * that count exchanges/windows, not just scans.
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: QueryStageExec        => p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }
}
