package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel state machine must agree with the batch
  * `ev_funnel` chain of min-after-previous aggregations when events
  * arrive in event-time order, across any micro-batch chopping, and
  * its per-user stage state must survive micro-batch boundaries.
  */
class StreamingFunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("streaming funnel equals the batch ev_funnel rows (sf0.001 replay, 3 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("ev_funnel")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> (
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(expected.nonEmpty && expected.valuesIterator.exists(_._3 >= 0L),
      "fixture must contain full-funnel users")

    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
      .sortBy(r => (r._3, r._4)) // event-time replay order
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingFunnel.funnelStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id"))
    val q = out.writeStream.format("memory").queryName("funnel_diff")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val sink = spark.table("funnel_diff").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getSeq[Long](r.fieldIndex("stage_us")).toIndexedSeq,
        r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (u, _, v) => v == maxVer(u) }
      .map { case (u, st, _) => u -> (st(0), st(1), st(2)) }.toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("stage state crosses micro-batch boundaries (view in batch 2 completes batch 1's signup)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = StreamingFunnel.funnelStream(
      mem.toDF().toDF("user_id", "event_type", "ts_us", "event_id"))
    val q = out.writeStream.format("memory").queryName("funnel_state")
      .outputMode("update").start()
    try {
      // batch 1: a view BEFORE signup must not count; signup lands
      mem.addData((7L, "view", 100L, 1L), (7L, "signup", 200L, 2L))
      q.processAllAvailable()
      // batch 2: view after the remembered signup completes stage 2;
      // purchase before it must not
      mem.addData((7L, "purchase", 250L, 3L), (7L, "view", 300L, 4L))
      q.processAllAvailable()
      // batch 3: purchase after the view completes the funnel
      mem.addData((7L, "purchase", 400L, 5L))
      q.processAllAvailable()
      val sink = spark.table("funnel_state").collect()
        .map(r => (r.getSeq[Long](r.fieldIndex("stage_us")).toIndexedSeq,
          r.getAs[Long]("version")))
        .sortBy(_._2)
      assert(sink.map(_._1).toSeq == Seq(
        Seq(200L, -1L, -1L),
        Seq(200L, 300L, -1L),
        Seq(200L, 300L, 400L)), sink.mkString(", "))
    } finally q.stop()
  }
}
