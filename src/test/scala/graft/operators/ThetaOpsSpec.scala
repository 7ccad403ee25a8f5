package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta set-operation estimates: below k distinct values the sketch
  * is EXACT, so the specs demand equality with exact set algebra, not
  * tolerances; and the retained-hash set is insertion-order- and
  * partition-independent, so estimates must be identical under any
  * repartitioning.
  */
class ThetaOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("synthetic overlapping populations: intersection/union/difference equal exact set algebra") {
    import spark.implicits._
    // A = {0..999}, B = {500..1499}, C = {1200..1299}: known overlaps
    val rows = (0 until 1000).map(i => ("A", i.toLong)) ++
      (500 until 1500).map(i => ("B", i.toLong)) ++
      (1200 until 1300).map(i => ("C", i.toLong))
    val df = rows.toDF("g", "v").repartition(7)
    val sks = ThetaOps.groupSketches(df, "g", col("v"))
    assert(ThetaOps.estimate(sks("A")) == 1000L)
    assert(ThetaOps.estimate(sks("B")) == 1000L)
    assert(ThetaOps.intersectionEstimate(sks("A"), sks("B")) == 500L)
    assert(ThetaOps.intersectionEstimate(sks("A"), sks("C")) == 0L)
    assert(ThetaOps.intersectionEstimate(sks("B"), sks("C")) == 100L)
    assert(ThetaOps.unionEstimate(sks("A"), sks("B")) == 1500L)
    assert(ThetaOps.differenceEstimate(sks("A"), sks("B")) == 500L)
    assert(ThetaOps.differenceEstimate(sks("C"), sks("B")) == 0L)
  }

  test("estimates are partition-independent: 1 vs 13 partitions give identical rows") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    def rows(parts: Int) =
      ThetaOps.pairwiseOverlap(ev.repartition(parts), "event_type", col("user_id"))
        .collect().map(_.toString).toSeq
    assert(rows(1) == rows(13) && rows(1).nonEmpty)
  }

  test("events pairwise overlap equals exact pair intersections (exact mode)") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val got = ThetaOps.pairwiseOverlap(ev, "event_type", col("user_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    val users = ev.select(col("event_type").as("t"), col("user_id").as("u")).distinct()
    val exact = users.as("a").join(users.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { case (pair, est) =>
      assert(est == exact.getOrElse(pair, 0L), s"$pair: est $est vs exact ${exact.get(pair)}")
    }
  }
}
