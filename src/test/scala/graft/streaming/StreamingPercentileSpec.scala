package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HistogramIndex

/** Counts merge by summation and the interpolation is shared
  * arithmetic, so the final streamed percentile must equal the batch
  * `percentileWithBatch` BIT-FOR-BIT after any micro-batch chopping.
  */
class StreamingPercentileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("final streamed medians equal the batch index+batch medians bit-for-bit (3 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val batch = li.filter(col("l_orderkey") % 10 < 3)
    val corpus = li.filter(col("l_orderkey") % 10 >= 3)
    val index = HistogramIndex.buildValueHistIndex(corpus, Seq("l_returnflag"),
      year(col("l_shipdate")), col("l_quantity"))

    val expected = HistogramIndex.percentileWithBatch(index, batch, "l_returnflag",
        col("l_quantity"), 0.5, "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val rows = batch.select(col("l_returnflag"), col("l_quantity").cast("double"))
      .as[(String, Double)].collect().toIndexedSeq
    val mem = MemoryStream[(String, Double)]
    val out = StreamingPercentile.percentileStream(index,
      mem.toDF().toDF("l_returnflag", "l_quantity"), "l_returnflag", "l_quantity", 0.5)
    val q = out.writeStream.format("memory").queryName("pct_stream")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val sinkRows = spark.table("pct_stream")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val maxVer = sinkRows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sinkRows.filter { case (g, _, v) => v == maxVer(g) }
      .map { case (g, m, _) => g -> m }.toMap
    assert(got == expected, s"stream $got != batch $expected")
  }
}
