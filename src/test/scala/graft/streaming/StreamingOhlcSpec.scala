package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch differential for the streaming OHLC bars: append-mode output
  * after the watermark passes must equal the identical aggregate run
  * as a batch query — exact equality (struct-argmin is arrival-order
  * independent, sums are DECIMAL-exact, same floor-to-hour windows).
  */
class StreamingOhlcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("append-mode bars equal the batch aggregate; late rows beyond the watermark are the only divergence risk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"), col("event_id"))
    val rows = ev.as[(Timestamp, String, Double, Long)].collect()
      .sortBy(r => (r._1.getTime, r._4)).toIndexedSeq

    val expected = StreamingOhlc.ohlcBars(ev.withColumn("ts", col("ts")))
      // batch run of the SAME plan minus watermark: groupBy window
      .collect() // (works in batch: watermark is a no-op on static data)
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))).toMap

    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val q = StreamingOhlc.ohlcBars(
        mem.toDF().toDF("ts", "event_type", "value", "event_id"))
      .writeStream.format("memory").queryName("ohlc_bars")
      .outputMode("append").start()
    try {
      rows.grouped(257).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      // advance the watermark far past the last real window so every
      // bar finalizes and appends
      val flushTs = new Timestamp(rows.last._1.getTime + 6L * 3600 * 1000)
      mem.addData(Seq((flushTs, "zz_flush", 0.0, Long.MaxValue)))
      q.processAllAvailable()
      mem.addData(Seq((new Timestamp(flushTs.getTime + 6L * 3600 * 1000),
        "zz_flush", 0.0, Long.MaxValue)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ohlc_bars")
      .filter(col("event_type") =!= "zz_flush")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7))).toMap
    assert(got.nonEmpty)
    assert(got == expected,
      s"only-batch=${(expected.keySet -- got.keySet).take(3)} " +
        s"only-stream=${(got.keySet -- expected.keySet).take(3)} " +
        s"diff=${expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(2)}")
  }
}
