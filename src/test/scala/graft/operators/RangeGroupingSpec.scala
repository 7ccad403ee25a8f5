package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavior checks for the explicit-GROUPING-SETS aggregate and the
  * RANGE-frame window (the DuckDB oracles are the exactness gate;
  * these re-derive the semantics independently).
  */
class RangeGroupingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("agg_grouping_sets = the two plain marginals, no pair grain, no grand total") {
    val li = graft.sources.Tables.lineitem(spark, dir)
      .withColumn("ec", round(col("l_extendedprice") * 100).cast("long"))
    def marginal(key: String, rfIsAll: Boolean) = li.groupBy(key)
      .agg(count(lit(1)).as("cnt"), sum("ec").as("sc"))
      .collect().map { r =>
        val k = r.getString(0)
        ((if (rfIsAll) "ALL" else k, if (rfIsAll) k else "ALL"),
          (r.getLong(1), r.getLong(2)))
      }
    val expected = (marginal("l_returnflag", rfIsAll = false) ++
      marginal("l_linestatus", rfIsAll = true)).toMap
    val got = SparkEntry.queries("agg_grouping_sets")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100))).toMap
    assert(got == expected)
    // no (rf, ls) pair rows, no ("ALL", "ALL") grand total
    assert(got.keySet.forall { case (rf, ls) => (rf == "ALL") != (ls == "ALL") })
  }

  test("window_range_frame matches a naive per-customer day-range recompute") {
    val rows = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("datediff(o_orderdate, DATE '1970-01-01')").cast("long").as("day"),
        round(col("o_totalprice") * 100).cast("long").as("oc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = rows.groupBy(_._2)
    val expected = rows.map { case (ok, ck, day, _) =>
      val sum = byCust(ck).collect {
        case (_, _, d, oc) if d >= day - 30 && d <= day => oc
      }.sum
      ok -> (ck, day, sum.toDouble / 100.0)
    }.toMap
    val got = SparkEntry.queries("window_range_frame")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
  }

  test("window_range_frame partitions by o_custkey (cardinality grows with data — no fixed cap)") {
    val plan = SparkEntry.queries("window_range_frame")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("specifiedwindowframe(RangeFrame"),
      s"expected a RANGE frame in the plan:\n$plan")
    assert(plan.contains("o_custkey"), "window must be keyed by customer")
  }
}
