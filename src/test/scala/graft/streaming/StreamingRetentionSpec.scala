package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming retention hits, aggregated to (cohort_day,
  * day_offset) cells, must equal the batch `ev_retention` matrix when
  * events arrive in event-time order, across any micro-batch chopping;
  * and the per-user (cohort, last-day) state must carry across
  * micro-batch boundaries without re-emitting an already-counted day.
  */
class StreamingRetentionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("streaming retention cells equal the batch ev_retention matrix (sf0.001, 5 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("ev_retention")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(expected.nonEmpty && expected.size > 5, "fixture must span several cells")

    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)) // event-time replay order
    val mem = MemoryStream[(Long, Long, Long)]
    val out = StreamingRetention.retentionHits(
      mem.toDF().toDF("user_id", "ts_us", "event_id"))
    val q = out.writeStream.format("memory").queryName("retention_diff")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 5 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("retention_diff")
      .groupBy("cohort_day", "day_offset").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("retention cells are chopping-invariant: two irregular micro-batch patterns agree") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3)).toIndexedSeq

    def runChopped(name: String, sizes: Iterator[Int]): Map[(Long, Long), Long] = {
      val mem = MemoryStream[(Long, Long, Long)]
      val q = StreamingRetention.retentionHits(
          mem.toDF().toDF("user_id", "ts_us", "event_id"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        var rest = rows
        while (rest.nonEmpty) {
          val n = math.min(sizes.next(), rest.length)
          mem.addData(rest.take(n))
          q.processAllAvailable()
          rest = rest.drop(n)
        }
      } finally q.stop()
      spark.table(name).groupBy("cohort_day", "day_offset").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    // two deliberately irregular, different chop patterns (prime-ish
    // strides) — per-user state must make the cells identical
    val a = runChopped("ret_chop_a", Iterator.continually(Seq(7, 131, 23, 977, 3)).flatten)
    val b = runChopped("ret_chop_b", Iterator.continually(Seq(1999, 11, 401)).flatten)
    assert(a == b && a.nonEmpty,
      s"chopping changed the cells: only-a=${(a.toSet -- b.toSet).take(3)} only-b=${(b.toSet -- a.toSet).take(3)}")
  }

  test("a day counted in batch 1 is not re-emitted in batch 2; a new day is") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000000L
    val mem = MemoryStream[(Long, Long, Long)]
    val out = StreamingRetention.retentionHits(
      mem.toDF().toDF("user_id", "ts_us", "event_id"))
    val q = out.writeStream.format("memory").queryName("retention_state")
      .outputMode("append").start()
    try {
      // day 0 twice: one hit (offset 0), cohort fixed at day 0
      mem.addData((7L, 10L * day + 5L, 1L), (7L, 10L * day + 9L, 2L))
      q.processAllAvailable()
      // day 0 again (no hit) + day 2 (hit, offset 2)
      mem.addData((7L, 10L * day + 99L, 3L), (7L, 12L * day + 1L, 4L))
      q.processAllAvailable()
      val got = spark.table("retention_state").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cohort_day"),
          r.getAs[Long]("day_offset"))).sorted.toSeq
      assert(got == Seq((7L, 10L, 0L), (7L, 10L, 2L)), got.mkString(", "))
    } finally q.stop()
  }
}
