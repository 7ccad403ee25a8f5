package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational capability battery: aggregation, joins, sorts, limits,
  * set ops, window functions — the categories of SURVEY.md §2.6, each
  * expressed as a declarative DataFrame plan (Catalyst handles
  * pushdown/pruning/join strategy; broadcast hints are explicit where
  * the dimension side is guaranteed small).
  *
  * Oracle-parity conventions (the driver hash-compares against DuckDB):
  *   - money/measure aggregates are computed in exact DECIMAL and cast
  *     to DOUBLE only at the end, so results are order-insensitive and
  *     bit-reproducible across engines;
  *   - every aggregate/computed column carries an explicit alias used
  *     verbatim in the oracle SQL;
  *   - every query has a total deterministic ORDER BY.
  */
object RelationalQueries {

  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val one = lit(1).cast("decimal(18,2)")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-style full-scan aggregation: partial aggregation map-side,
    // 6 groups total — the canonical "would hold at 100 TB" scan+agg shape.
    "q1_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum((dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          sum(((dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("decimal(18,4)") * (one + dec("l_tax")))).cast("double").as("sum_charge"),
          (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
