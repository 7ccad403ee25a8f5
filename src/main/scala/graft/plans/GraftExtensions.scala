package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extensions entry point: register graft's planner strategies
  * the spark-submit way —
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * (Library callers get the same registration lazily on first use of
  * the operators.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AnchoredWindowStrategy)
    // SQL faces of the native expressions (same list the per-session
    // GraftSqlFunctions.register uses)
    graft.functions.GraftSqlFunctions.all.foreach {
      case (name, usage, builder) =>
        e.injectFunction((
          org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions.GraftSqlFunctions", name, usage),
          builder))
    }
  }
}
