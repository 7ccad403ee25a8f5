package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming gap detector must emit exactly the batch-derived gap
  * list when events arrive in time order, under any micro-batch
  * chopping (the last-seen-hour state carries gap continuity across
  * batch boundaries), and it must also agree with the batch
  * `ev_gap_detect` summary's missing-hour totals.
  */
class StreamingGapsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def events = graft.sources.Tables.events(spark, dir)

  private def expected: Seq[(String, Long, Long)] =
    StreamingGaps.gapsBatch(events.select("event_type", "ts_us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

  private def runChopped(chops: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = events.select(col("event_type"), col("ts_us"))
      .as[(String, Long)].collect().sortBy(_._2)
    val mem = MemoryStream[(String, Long)]
    val stream = StreamingGaps.gapStream(mem.toDF().toDF("event_type", "ts_us"))
    val name = s"gaps_stream_$chops"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / chops + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    } finally q.stop()
  }

  test("stream gap rows equal the batch-derived list across 4 micro-batches") {
    val exp = expected
    assert(exp.nonEmpty, "sf0.001 must contain hourly gaps")
    assert(runChopped(4) == exp)
  }

  test("chopping-invariant: one batch equals seven batches") {
    assert(runChopped(1) == runChopped(7))
  }

  test("gap lengths sum to ev_gap_detect's missing counts per type") {
    val sums = expected.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val summary = graft.SparkEntry.queries("ev_gap_detect")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(summary.forall { case (t, miss) => sums.getOrElse(t, 0L) == miss })
  }
}
