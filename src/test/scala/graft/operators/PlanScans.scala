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
}
