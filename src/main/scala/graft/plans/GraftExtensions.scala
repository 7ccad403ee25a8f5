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
    // SQL faces of the native expressions — the SAME triples the
    // per-session GraftSqlFunctions.register uses
    graft.functions.GraftSqlFunctions.entries.foreach(e.injectFunction)
  }
}
