package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextQueries

/** The per-row curation screens (blocklist, quality heuristics) are
  * stateless column expressions — the SAME expression tree must run on
  * a stream at ingest time and produce byte-identical verdicts to the
  * batch pass, under any micro-batch chopping. This is the
  * filters-at-ingest deployment shape: drop flagged documents before
  * they ever land.
  */
class StreamingFilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("blocklist verdicts on a stream equal the batch screen, any chopping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.SparkEntry.queries("text_blocklist")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sorted.toSeq

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val listCol = array(TextQueries.Blocklist.map(lit): _*)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val stream = mem.toDF().toDF("doc_id", "text")
      .withColumn("toks", toks)
      .select(col("doc_id"),
        size(filter(col("toks"), t => array_contains(listCol, t)))
          .cast("long").as("n_hits"),
        size(filter(array_distinct(col("toks")), t => array_contains(listCol, t)))
          .cast("long").as("n_distinct_hits"))
      .withColumn("clean", col("n_hits") === 0L)
    val q = stream.writeStream.format("memory").queryName("blk_stream")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { c =>
        mem.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.table("blk_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sorted.toSeq
      assert(got == batch)
    } finally q.stop()
  }
}
