package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the anchored count-or-time window, mirroring
  * the reference's window-semantics tests (reference __tests__/step.ts:
  * disjoint size-2 groups :61-86, timeout flush :88-111).
  */
class HybridWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def vectors(rows: Seq[(String, Long, Long)], maxEvents: Int,
                      maxSeconds: Double): Map[(String, Long), Seq[Long]] = {
    import spark.implicits._
    val df = rows.toDF("k", "ts_us", "id")
    HybridWindow.anchoredVectors(df, Seq("k"), "ts_us", Seq("id"), maxEvents, maxSeconds)
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(3)))
      .view.mapValues(_.map(_.getLong(2)).sorted.toSeq).toMap
  }

  test("reduce count windows: size 2 over 1..5 => [1,2],[3,4],[5]") {
    val got = vectors((1L to 5L).map(i => ("a", i * 1000000L, i)), 2, -1)
    assert(got == Map(("a", 0L) -> Seq(1L, 2L), ("a", 1L) -> Seq(3L, 4L), ("a", 2L) -> Seq(5L)))
  }

  test("timeout flush: 10s windows anchored at first event => [1,2],[3],[4]") {
    val rows = Seq(("a", 0L, 1L), ("a", 5000000L, 2L), ("a", 12000000L, 3L), ("a", 40000000L, 4L))
    val got = vectors(rows, 3, 10.0)
    assert(got == Map(("a", 0L) -> Seq(1L, 2L), ("a", 1L) -> Seq(3L), ("a", 2L) -> Seq(4L)))
  }

  test("count arm closes exactly at maxEvents even inside the time bound") {
    val rows = (1L to 7L).map(i => ("a", i * 1000L, i))
    val got = vectors(rows, 3, 1000.0)
    assert(got == Map(("a", 0L) -> Seq(1L, 2L, 3L), ("a", 1L) -> Seq(4L, 5L, 6L), ("a", 2L) -> Seq(7L)))
  }

  test("keys are windowed independently") {
    val rows = Seq(("a", 0L, 1L), ("b", 0L, 2L), ("a", 1L, 3L), ("b", 1L, 4L))
    val got = vectors(rows, 2, -1)
    assert(got == Map(("a", 0L) -> Seq(1L, 3L), ("b", 0L) -> Seq(2L, 4L)))
  }

  test("singleton default (events=1) => every event its own vector") {
    val rows = (1L to 3L).map(i => ("a", i, i))
    val got = vectors(rows, 1, -1)
    assert(got.values.forall(_.size == 1) && got.size == 3)
  }
}
