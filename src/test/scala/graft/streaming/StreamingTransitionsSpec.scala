package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming transition arm must reproduce the batch
  * ev_transitions counts exactly when events arrive in time order —
  * including the pairs that straddle micro-batch boundaries (the
  * per-user last-event state) — under any chopping.
  */
class StreamingTransitionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def expectedCounts: Map[(String, String), Long] =
    graft.SparkEntry.queries("ev_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def runChopped(chops: Int): Map[(String, String), Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._2, r._3))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val stream = StreamingTransitions.transitionStream(
      mem.toDF().toDF("user_id", "ts_us", "event_id", "event_type"))
    val name = s"trans_stream_$chops"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / chops + 1)).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      spark.table(name).groupBy("from_type", "to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    } finally q.stop()
  }

  test("stream transition counts equal batch ev_transitions across 4 micro-batches") {
    val exp = expectedCounts
    assert(exp.nonEmpty && exp.values.sum > 500)
    assert(runChopped(4) == exp)
  }

  test("chopping-invariant: one batch equals six batches") {
    assert(runChopped(1) == runChopped(6))
  }
}
