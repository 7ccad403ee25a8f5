package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The streaming novelty arm must agree with the batch `text_novelty`
  * query byte-for-byte on the same corpus split, under any micro-batch
  * chopping (the probe is stateless per document — a verdict depends
  * only on the static gram index).
  */
class StreamingNoveltySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def expectedRows: Seq[(Long, Long, Long, Double)] =
    SparkEntry.queries("text_novelty")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq

  private def runChopped(chops: Int): Seq[(Long, Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet(s"$dir/documents.parquet")
    // the persisted-index discipline: materialize the gram index to
    // parquet and stream against THAT, so each micro-batch pays an
    // index scan, not a corpus re-tokenize (the static side of a
    // stream-static join re-executes per batch)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-gramidx").toString
    StreamingNovelty.buildGramIndex(all.filter(col("doc_id") % 10 >= 3))
      .write.mode("overwrite").parquet(idxDir)
    val index = spark.read.parquet(idxDir)
    val docs = all.filter(col("doc_id") % 10 < 3)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingNovelty.noveltyStream(index, mem.toDF().toDF("doc_id", "text"))
    val name = s"novelty_stream_$chops"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / chops + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3))).sorted.toSeq
    } finally q.stop()
  }

  test("stream novelty equals batch text_novelty across 3 micro-batches") {
    val expected = expectedRows
    assert(expected.nonEmpty && expected.exists(_._3 > 0),
      "split must contain novel grams")
    assert(runChopped(3) == expected)
  }

  test("chopping-invariant: one batch equals five batches") {
    assert(runChopped(1) == runChopped(5))
  }
}
