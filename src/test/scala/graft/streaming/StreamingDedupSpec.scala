package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** The streaming incremental-dedup arm must agree with the batch probe
  * byte-for-byte when documents arrive in doc-id order, no matter how
  * the stream is chopped into micro-batches, and its within-stream
  * keeper state must survive micro-batch boundaries.
  */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("stream probe equals the batch probe across 3 micro-batches (sf0.001 split)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batchDf = all.filter(col("doc_id") % 10 < 3)
    val corpus = all.filter(col("doc_id") % 10 >= 3)
    val index = TextQueries.buildExactIndex(corpus)

    val expected = TextQueries.probeExactIndex(index, batchDf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq

    val docs = batchDf.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingDedup.probeExactIndexStream(
      index, mem.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("incdedup_diff")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("incdedup_diff")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
      assert(got.nonEmpty && got == expected)
    } finally q.stop()
  }

  test("streaming minhash probe equals the batch probe across 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batchDf = all.filter(col("doc_id") % 10 < 3)
    val (bands, sigs) = TextQueries.buildMinhashIndex(all.filter(col("doc_id") % 10 >= 3))
    val expected = TextQueries.probeMinhashIndex(bands, sigs, batchDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(expected.nonEmpty, "sf0.001 split must contain cross-split near-dups")

    val docs = batchDf.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingDedup.probeMinhashIndexStream(
      bands, sigs, mem.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("incdedup_mh")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("incdedup_mh")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming chunk probe equals the batch chunk probe across 3 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batchDf = all.filter(col("doc_id") % 10 < 3)
    val index = TextQueries.buildChunkIndex(all.filter(col("doc_id") % 10 >= 3))
    val expected = TextQueries.probeChunkIndex(index, TextQueries.chunkRows(batchDf))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(expected.map(_._3).distinct.size == 3,
      "sf0.001 split must exercise all three verdicts")

    val docs = batchDf.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingDedup.probeChunkIndexStream(
      index, mem.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("incdedup_chunk")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val got = spark.table("incdedup_chunk")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("keeper state crosses micro-batch boundaries (later dup points at first batch's keeper)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = TextQueries.buildExactIndex(
      Seq((100L, "indexed text")).toDF("doc_id", "text"))
    val mem = MemoryStream[(Long, String)]
    val stream = StreamingDedup.probeExactIndexStream(
      index, mem.toDF().toDF("doc_id", "text"))
    val q = stream.writeStream.format("memory").queryName("incdedup_state")
      .outputMode("append").start()
    try {
      mem.addData((1L, "fresh text"), (2L, "indexed text"))
      q.processAllAvailable()
      mem.addData((3L, "fresh text"), (4L, "another"))
      q.processAllAvailable()
      mem.addData((5L, "fresh text"), (6L, "another"))
      q.processAllAvailable()
      val got = spark.table("incdedup_state")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
      assert(got == Seq(
        (1L, "unique", -1L),
        (2L, "corpus_dup", 100L),
        (3L, "batch_dup", 1L),
        (4L, "unique", -1L),
        (5L, "batch_dup", 1L),
        (6L, "batch_dup", 4L)))
    } finally q.stop()
  }
}
