package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming Misra-Gries fold must keep the MG guarantees after
  * any micro-batch chopping: vs EXACT token counts over everything
  * streamed, the final summary (1) never overestimates, (2)
  * undercounts by at most n/(k+1), and (3) therefore contains every
  * token with true count above n/(k+1). These are the same gates
  * Verify's invariant applies to the batch text_heavy_hitters.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("MG guarantees hold for the final streamed summaries (4 micro-batches, sf0.001 tokens)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = graft.operators.TextQueries.HHCounters
    val toks = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .as[(String, String)].collect().toIndexedSeq

    val mem = MemoryStream[(String, String)]
    val out = StreamingHeavyHitters.topTokensStream(
      mem.toDF().toDF("group", "token"), k)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      toks.grouped(math.max(1, toks.length / 4 + 1)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    // the latest summary per group = rows at that group's max version
    val sinkRows = spark.table("hh_stream")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val maxVer = sinkRows.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val latest = sinkRows.filter { case (g, _, _, v) => v == maxVer(g) }
      .map { case (g, t, c, _) => (g, t) -> c }.toMap

    val exact = toks.groupBy(identity).map { case ((g, t), xs) => (g, t) -> xs.size.toLong }
    val n = toks.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }

    // (1) no overestimates
    latest.foreach { case (key, approx) =>
      assert(approx <= exact.getOrElse(key, 0L), s"$key overestimated: $approx")
    }
    // (2) bounded undercount and (3) threshold coverage
    exact.foreach { case (key @ (g, _), ex) =>
      val approx = latest.getOrElse(key, 0L)
      val bound = n(g).toDouble / (k + 1)
      assert(ex - approx <= bound, s"$key undercount ${ex - approx} > $bound")
      if (ex > bound) assert(latest.contains(key), s"$key above threshold but absent")
    }
    assert(latest.nonEmpty)
  }
}
