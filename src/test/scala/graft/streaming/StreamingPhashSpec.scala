package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.operators.AnnQueries

/** The streaming perceptual-hash admission arm must agree with the
  * batch index probe byte-for-byte under ANY micro-batch chopping —
  * verdicts depend only on the static code index, so the operator is
  * stateless per document by construction and this spec pins it.
  */
class StreamingPhashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def canonRows(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3))).sorted.toSeq

  test("streaming phash admission equals the batch index probe, whether the crawl arrives as one wave or three") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    val hashed = Multimodal.bmpDHash(
      Multimodal.attachSynthBmp(ids, "doc_id", "bin"), "bin", "doc_id")
    val index = hashed.filter(col("doc_id") % 10 >= 3).persist()
    val batchIds = ids.filter(col("doc_id") % 10 < 3)
      .collect().map(_.getLong(0)).sorted

    val expected = canonRows(AnnQueries.phashProbeIndex(
      index, hashed.filter(col("doc_id") % 10 < 3)).collect())
    assert(expected.exists(_._2 == "dup") && expected.exists(_._2 == "fresh"),
      "fixture must exercise both verdicts")

    def run(name: String, waves: Int): Seq[(Long, String, Long, Long)] = {
      val mem = MemoryStream[(Long, Array[Byte])]
      val q = StreamingPhash.probeIndexStream(index,
          mem.toDF().toDF("doc_id", "bin"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batchIds.grouped(math.max(1, batchIds.length / waves + 1)).foreach { chunk =>
          mem.addData(chunk.map(id => (id, Multimodal.synthBmpBytes(id))).toIndexedSeq)
          q.processAllAvailable()
        }
        canonRows(spark.table(name).collect())
      } finally q.stop()
    }

    val oneWave = run("phash_one", 1)
    val threeWaves = run("phash_three", 3)
    assert(oneWave == expected, "1-wave streaming admission diverged from batch")
    assert(threeWaves == expected, "3-wave streaming admission diverged from batch")
    index.unpersist()
  }
}
