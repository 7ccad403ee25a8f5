package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming multi-touch fold must agree with the batch
  * `ev_attribution_linear` / `ev_attribution_time_decay` rollups
  * under any micro-batch chopping, its touch-list state must stay
  * window-bounded, and the weight arithmetic must mirror the batch
  * fixed point exactly.
  */
class StreamingMultiTouchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def choppedRollup(decay: Boolean, name: String,
                            nChunks: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
        col("value"))
      .as[(Long, String, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._4)) // event-time replay order
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val out = StreamingMultiTouch.creditStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id", "value"),
      decay = decay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / nChunks + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("credit_fp").as("fp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("streaming linear rollup equals batch ev_attribution_linear across choppings") {
    val expected = graft.SparkEntry.queries("ev_attribution_linear")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.size >= 2, s"fixture too thin: $expected")
    assert(choppedRollup(decay = false, "mt_lin3", 3) == expected)
    assert(choppedRollup(decay = false, "mt_lin7", 7) == expected,
      "linear rollup depends on micro-batch chopping")
  }

  test("streaming time-decay rollup equals batch ev_attribution_time_decay across choppings") {
    val expected = graft.SparkEntry.queries("ev_attribution_time_decay")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.size >= 2, s"fixture too thin: $expected")
    assert(choppedRollup(decay = true, "mt_dec3", 3) == expected)
    assert(choppedRollup(decay = true, "mt_dec7", 7) == expected,
      "decay rollup depends on micro-batch chopping")
  }

  private def choppedRollupU(name: String, nChunks: Int): Map[String, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"),
        col("value"))
      .as[(Long, String, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._4))
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val out = StreamingMultiTouch.creditStreamU(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id", "value"))
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / nChunks + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("credit_fp").as("fp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("streaming U-shape rollup equals batch ev_attribution_u_shape across choppings") {
    val expected = graft.SparkEntry.queries("ev_attribution_u_shape")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(expected.size >= 2, s"fixture too thin: $expected")
    assert(choppedRollupU("mt_u3", 3) == expected)
    assert(choppedRollupU("mt_u7", 7) == expected,
      "U-shape rollup depends on micro-batch chopping")
  }

  test("weights and window edges: even split, per-day halving, same-ts exclusion, 7-day expiry, window-bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = StreamingMultiTouch.DayUs
    val mem = MemoryStream[(Long, String, Long, Long, Double)]
    val out = StreamingMultiTouch.creditStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id", "value"),
      decay = true)
    val q = out.writeStream.format("memory").queryName("mt_edge")
      .outputMode("append").start()
    try {
      // user 1: click 2 days old (bucket 1, weight 32), view 1us old
      // (bucket 0, weight 64), a view AT the purchase ts (excluded) →
      // click 32/96, view 64/96 of 500 cents in 1e-4-cent units
      mem.addData(
        (1L, "click", 0L, 1L, 0.0),
        (1L, "view", 2 * day - 1, 2L, 0.0),
        (1L, "view", 2 * day, 3L, 0.0), // same-ts: excluded
        (1L, "purchase", 2 * day, 4L, 5.0))
      q.processAllAvailable()
      // user 2: only touch is 8 days old at the purchase → direct, and
      // the expired touch is PRUNED from state (window-bounded)
      mem.addData((2L, "click", 0L, 5L, 0.0))
      q.processAllAvailable()
      mem.addData((2L, "purchase", 8 * day, 6L, 1.0))
      q.processAllAvailable()
      val got = spark.table("mt_edge").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("channel"),
          r.getAs[Long]("credit_fp"))).toSet
      val vcFp = 500L * 10000L
      assert(got == Set(
        (4L, "click", vcFp * 32 / 96),
        (4L, "view", vcFp * 64 / 96),
        (6L, "direct", 100L * 10000L)), got.mkString(", "))
    } finally q.stop()
  }
}
