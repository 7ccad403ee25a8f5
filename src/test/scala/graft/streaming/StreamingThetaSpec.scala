package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ThetaOps

/** Differential for the streaming theta arm: after all micro-batches,
  * each group's LATEST (stream, union, overlap) estimates must EQUAL
  * the batch theta set algebra over the same rows — below k=4096
  * distincts the sketches are exact and deterministic in the arrived
  * SET, so this is exact equality under any chopping, including the
  * overlap (the distinct intersection HLL cannot express).
  */
class StreamingThetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("latest streamed (stream, union, overlap) equal batch theta set algebra (4 micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = all.filter(col("event_id") % 10 < 3)
    val corpus = all.filter(col("event_id") % 10 >= 3)

    // batch truth: per-group theta sketches of both sides, exact at
    // this scale (15 distinct users << k)
    val corpusSk = ThetaOps.groupSketches(corpus, "event_type", col("user_id"))
    val batchSk = ThetaOps.groupSketches(batch, "event_type", col("user_id"))
    val expected = batchSk.map { case (g, sb) =>
      g -> (ThetaOps.estimate(sb),
        corpusSk.get(g).map(ThetaOps.unionEstimate(sb, _)).getOrElse(ThetaOps.estimate(sb)),
        corpusSk.get(g).map(ThetaOps.intersectionEstimate(sb, _)).getOrElse(0L))
    }
    assert(expected.nonEmpty && expected.valuesIterator.exists(_._3 > 0L),
      "fixture must produce nonzero overlaps")

    val rows = batch.select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect().toIndexedSeq
    val mem = MemoryStream[(String, Long)]
    val est = StreamingTheta.overlapStream(corpus,
      mem.toDF().toDF("event_type", "user_id"), "event_type", "user_id")
    val q = est.writeStream.format("memory").queryName("theta_diff")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("theta_diff")
      .withColumn("__i", monotonically_increasing_id())
      .groupBy("group").agg(
        max_by(struct(col("est_stream"), col("est_union"), col("est_overlap")),
          col("__i")).as("e"))
      .collect().map(r => r.getString(0) -> (
        r.getStruct(1).getLong(0), r.getStruct(1).getLong(1), r.getStruct(1).getLong(2)))
      .toMap
    assert(got == expected, s"stream $got != batch $expected")
  }
}
