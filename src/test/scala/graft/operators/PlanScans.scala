package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Test helper: all file scans in an executed plan, unwrapping the
  * AQE nodes a plain `.collect` stops at — and looking THROUGH cached
  * relations (a `.persist()`ed intermediate still scans its sources
  * on first materialization; a scan-count pin must see that plan, not
  * report zero scans because a cache sits in between).
  */
object PlanScans {

  def allScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    // several references to ONE cached relation are one materialization
    // — count its scans once, or a shared persist would read as N scans
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case q: QueryStageExec        => go(q.plan)
      case m: InMemoryTableScanExec =>
        if (seen.add(m.relation.cachedPlan)) go(m.relation.cachedPlan) else Seq.empty
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(go)
    }
    go(p)
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
