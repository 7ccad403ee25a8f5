package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CmsOps

/** Differentials for the streaming count-min arm: the cell-update
  * stream reconstructs the EXACT batch-built sketch per group (counts
  * are monotone, so max-per-cell over the update stream is the final
  * total), independent of micro-batch chopping.
  */
class StreamingCmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** (lang, token) rows in doc_id order — the replay corpus. */
  private def rows: IndexedSeq[(String, String)] = {
    import graft.functions.TextFunctions
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getString(2))).toIndexedSeq
  }

  /** Batch truth: per-lang sketch cells built by CmsOps. */
  private def batchCells(data: Seq[(String, String)]): Map[(String, Int, Long), Long] = {
    import spark.implicits._
    data.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
      CmsOps.buildCms(rs.map(_._2).toDF("tok"), col("tok"))
        .collect().map(r => (lang, r.getInt(0), r.getLong(1)) -> r.getLong(2)).toSeq
    }.toMap
  }

  private def runChopped(data: IndexedSeq[(String, String)], name: String,
                         sizes: Iterator[Int]): Map[(String, Int, Long), Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = StreamingCms.cmsCells(mem.toDF().toDF("lang", "tok"), "lang", "tok")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      var rest = data
      while (rest.nonEmpty) {
        val n = math.min(sizes.next(), rest.length)
        mem.addData(rest.take(n))
        q.processAllAvailable()
        rest = rest.drop(n)
      }
    } finally q.stop()
    spark.table(name).groupBy("group", "d", "cell").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2).toLong) -> r.getLong(3))
      .toMap
  }

  test("maintained cells equal the batch sketch per group, under two different chop patterns") {
    val data = rows
    val expected = batchCells(data)
    val a = runChopped(data, "cms_chop_a", Iterator.continually(Seq(43, 991, 7, 245)).flatten)
    assert(a == expected && a.nonEmpty,
      s"only-batch=${(expected.toSet -- a.toSet).take(3)} only-stream=${(a.toSet -- expected.toSet).take(3)}")
    val b = runChopped(data, "cms_chop_b", Iterator.continually(Seq(1777, 31)).flatten)
    assert(b == expected, "second chop pattern diverged")
  }

  test("probing the reconstructed cells gives batch-identical estimates") {
    import spark.implicits._
    val data = rows
    val got = runChopped(data, "cms_probe", Iterator.continually(577))
    // probe every distinct (lang, token) against reconstructed vs batch cells
    val expected = batchCells(data)
    def estimate(cells: Map[(String, Int, Long), Long], lang: String, t: String): Long =
      (0 until CmsOps.Depth)
        .map(d => cells.getOrElse((lang, d, CmsOps.cellOf(d, t).toLong), 0L)).min
    val probes = data.distinct
    assert(probes.nonEmpty)
    probes.foreach { case (lang, t) =>
      assert(estimate(got, lang, t) == estimate(expected, lang, t),
        s"estimate diverged for ($lang, $t)")
    }
  }
}
