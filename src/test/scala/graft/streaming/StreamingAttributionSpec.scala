package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming last-touch fold must agree with the batch
  * `ev_attribution_last_touch` rollup when events arrive in
  * event-time order, across any micro-batch chopping, and its
  * one-pair-per-user state must survive micro-batch boundaries.
  */
class StreamingAttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("streaming attribution rollup equals batch ev_attribution_last_touch (sf0.001 replay, 3 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("ev_attribution_last_touch")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.size >= 2, s"fixture too thin: $expected")

    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
        col("value"))
      .as[(Long, String, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._4)) // event-time replay order
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val out = StreamingAttribution.attributionStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id", "value"))
    val q = out.writeStream.format("memory").queryName("attr_diff")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("attr_diff")
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("revenue_cents").as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("touch state crosses micro-batch boundaries; the 7-day window and pre-touch purchases fall to direct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 24L * 3600 * 1000000L
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val out = StreamingAttribution.attributionStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id", "value"))
    val q = out.writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      // batch 1: purchase BEFORE any touch -> direct; then a click
      mem.addData((7L, "purchase", 100L, 1L, 1.0), (7L, "click", 200L, 2L, 0.0))
      q.processAllAvailable()
      // batch 2: purchase 1 day later credits the REMEMBERED click;
      // a view then supersedes the click
      mem.addData((7L, "purchase", 200L + day, 3L, 2.0),
        (7L, "view", 300L + day, 4L, 0.0))
      q.processAllAvailable()
      // batch 3: a purchase 8 days after the view is outside the
      // window -> direct
      mem.addData((7L, "purchase", 300L + 9 * day, 5L, 4.0))
      q.processAllAvailable()
      val sink = spark.table("attr_state").collect()
        .map(r => (r.getAs[Long]("purchase_us"), r.getAs[String]("channel"),
          r.getAs[Long]("revenue_cents"))).sortBy(_._1)
      assert(sink.toSeq == Seq(
        (100L, "direct", 100L),
        (200L + day, "click", 200L),
        (300L + 9 * day, "direct", 400L)), sink.mkString(", "))
    } finally q.stop()
  }
}
