package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SketchIndex

/** Differential for the streaming HLL arm: after all micro-batches,
  * each group's LATEST streamed estimate must EQUAL the batch
  * `SketchIndex.estimateWithBatch` over the same rows — HLL registers
  * are order- and chopping-independent, and StreamingSketch mirrors
  * hll_sketch_agg's lgK/target type, so this is exact equality, not a
  * tolerance check.
  */
class StreamingSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("latest streamed estimates equal the batch index+batch estimates (3 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = all.filter(col("event_id") % 10 < 3)
    val corpus = all.filter(col("event_id") % 10 >= 3)
    val index = SketchIndex.buildDistinctIndex(corpus, Seq("event_type"),
      to_date(col("ts")).cast("string"), col("user_id"))

    val expected = SketchIndex.estimateWithBatch(index, batch, Seq("event_type"),
        col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val rows = batch.select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect().toIndexedSeq
    val mem = MemoryStream[(String, Long)]
    val est = StreamingSketch.estimateStream(index,
      mem.toDF().toDF("event_type", "user_id"), "event_type", "user_id")
    val q = est.writeStream.format("memory").queryName("sketch_diff")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    // update-mode sink: the LAST row per group is the final estimate
    val got = spark.table("sketch_diff")
      .withColumn("__i", monotonically_increasing_id())
      .groupBy("group").agg(max_by(col("est_distinct"), col("__i")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, s"stream $got != batch $expected")
  }
}
