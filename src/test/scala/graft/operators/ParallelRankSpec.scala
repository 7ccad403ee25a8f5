package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed two-level rank must equal the plain single-task
  * window EXACTLY — row_number is a function of the total order alone,
  * so bucket boundaries must never show through. Probes the places a
  * segmented rank goes wrong: ties on the bucketing column, keys
  * missing from some buckets, constant order column (one bucket),
  * and the frame-aggregation wrapper's context handoff.
  */
class ParallelRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def randomRows(n: Int, keys: Int, tsRange: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (s"k${rnd.nextInt(keys)}", rnd.nextLong(tsRange), i.toLong))
  }

  private def diffCount(rows: Seq[(String, Long, Long)]): Long = {
    import spark.implicits._
    val df = rows.toDF("k", "ts", "id")
    val plain = df.withColumn("rn", row_number().over(
      Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))).cast("long"))
    // threshold 0 forces the segmented path — the thing under test
    val par = ParallelRank.withRowNumber(df, Seq(col("k")), Seq(col("ts"), col("id")), "rn2",
      smallThreshold = 0L)
    plain.join(par, Seq("k", "ts", "id")).filter(col("rn") =!= col("rn2")).count()
  }

  test("random data with heavy ties: identical to the plain window") {
    // tsRange 50 over 5000 rows forces ~100-deep tie groups — every
    // tie group must land in one bucket and order by the tiebreaker
    assert(diffCount(randomRows(5000, keys = 7, tsRange = 50, seed = 11)) == 0)
  }

  test("spread timestamps, many buckets: identical to the plain window") {
    assert(diffCount(randomRows(5000, keys = 3, tsRange = 1_000_000_000L, seed = 12)) == 0)
  }

  test("constant order column degenerates to one bucket, still exact") {
    assert(diffCount((0 until 500).map(i => (s"k${i % 4}", 42L, i.toLong))) == 0)
  }

  test("slidingTimeVectors segmented path equals the plain plan (threshold 0 vs huge)") {
    import spark.implicits._
    val rows = randomRows(6000, keys = 3, tsRange = 3_600_000_000L, seed = 21)
      .map { case (k, ts, id) => (k, ts, id, id * 3 + 1) }
    val df = rows.toDF("k", "ts", "id", "v")
    def run(thr: Long) = StepOps.slidingTimeVectors(df, Seq(col("k")),
        Seq(col("ts"), col("id")), col("ts"), 50, 600_000_000L, smallThreshold = thr)
      .groupBy("k", "vec_id")
      .agg(count(lit(1)).as("c"), sum("v").as("s"),
        min("id").as("f"), max("id").as("l"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(run(0L) == run(Long.MaxValue))
  }

  test("empty input yields the rank column with no rows") {
    import spark.implicits._
    val df = Seq.empty[(String, Long, Long)].toDF("k", "ts", "id")
    val out = ParallelRank.withRowNumber(df, Seq(col("k")), Seq(col("ts"), col("id")), "rn")
    assert(out.columns.contains("rn") && out.count() == 0)
  }

  test("no keys (global rank): identical to the global window") {
    import spark.implicits._
    val rows = randomRows(2000, keys = 1, tsRange = 500, seed = 13)
    val df = rows.toDF("k", "ts", "id")
    val plain = df.withColumn("rn", row_number().over(
      Window.orderBy(col("ts"), col("id"))).cast("long"))
    val par = ParallelRank.withRowNumber(df, Seq.empty, Seq(col("ts"), col("id")), "rn2",
      smallThreshold = 0L)
    assert(plain.join(par, Seq("k", "ts", "id"))
      .filter(col("rn") =!= col("rn2")).count() == 0)
  }

  test("withSlidingFrameAggs equals the plain leading row-frame across bucket boundaries") {
    import spark.implicits._
    // size 5 against bucketRows=4096: cross-boundary frames exist once
    // n > 4096 per key
    val rows = randomRows(10000, keys = 2, tsRange = 100_000L, seed = 14)
    val df = rows.toDF("k", "ts", "id")
    val w = StepOps.slidingFrame(Seq(col("k")), Seq(col("ts"), col("id")), 5)
    val plain = df
      .withColumn("fn", count(lit(1)).over(w))
      .withColumn("fs", sum(col("id")).over(w))
    val seg = StepOps.withSlidingFrameAggs(df, Seq(col("k")),
        Seq(col("ts"), col("id")), 5, smallThreshold = 0L) { (d, ww) =>
      d.withColumn("fn2", count(lit(1)).over(ww))
        .withColumn("fs2", sum(col("id")).over(ww))
    }
    val joined = plain.join(seg, Seq("k", "ts", "id"))
    assert(joined.count() == 10000)
    assert(joined.filter(col("fn") =!= col("fn2") || col("fs") =!= col("fs2")).count() == 0)
  }

  // ---- withRunningSum: the distributed prefix sum ----

  private def sumDiffCount(rows: Seq[(String, Long, Long)]): Long = {
    import spark.implicits._
    val df = rows.toDF("k", "ts", "id").withColumn("v", col("id") % 97 + 1)
    val plain = df.withColumn("cum", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val par = ParallelRank.withRunningSum(df, Seq(col("k")),
      Seq(col("ts"), col("id")), col("v"), "cum2", smallThreshold = 0L)
    plain.join(par, Seq("k", "ts", "id")).filter(col("cum") =!= col("cum2")).count()
  }

  test("running sum with heavy ties: identical to the plain window") {
    assert(sumDiffCount(randomRows(5000, keys = 7, tsRange = 50, seed = 31)) == 0)
  }

  test("running sum, spread order column: identical to the plain window") {
    assert(sumDiffCount(randomRows(5000, keys = 3, tsRange = 1_000_000_000L, seed = 32)) == 0)
  }

  test("running sum, constant order column (one bucket): exact") {
    assert(sumDiffCount((0 until 500).map(i => (s"k${i % 4}", 42L, i.toLong))) == 0)
  }

  test("running sum stays LONG (integer token counts never reorder as floats)") {
    import spark.implicits._
    val df = randomRows(200, keys = 2, tsRange = 100, seed = 33).toDF("k", "ts", "id")
    val out = ParallelRank.withRunningSum(df, Seq(col("k")),
      Seq(col("ts"), col("id")), col("id"), "cum", smallThreshold = 0L)
    assert(out.schema("cum").dataType == org.apache.spark.sql.types.LongType)
  }

  test("running sum on empty input yields no rows, column present") {
    import spark.implicits._
    val df = Seq.empty[(String, Long, Long)].toDF("k", "ts", "id")
    val out = ParallelRank.withRunningSum(df, Seq(col("k")),
      Seq(col("ts"), col("id")), col("id"), "cum")
    assert(out.columns.contains("cum") && out.count() == 0)
  }

  // ---- withTopKRank: the salted exact per-key top-k ----

  test("salted top-k equals the plain window top-k, ranks and rows") {
    import spark.implicits._
    val df = randomRows(8000, keys = 5, tsRange = 300, seed = 41).toDF("k", "ts", "id")
    val plain = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("ts"), col("id"))).cast("long"))
      .filter(col("rn") <= 7)
    val par = ParallelRank.withTopKRank(df, Seq(col("k")),
      Seq(col("ts").asc, col("id").asc), 7, xxhash64(col("id")), "rn2",
      smallThreshold = 0L)
    assert(par.count() == plain.count())
    assert(plain.join(par, Seq("k", "ts", "id")).count() == plain.count())
    assert(plain.join(par, Seq("k", "ts", "id"))
      .filter(col("rn") =!= col("rn2")).count() == 0)
  }

  test("salted top-k with descending order: exact survivors") {
    import spark.implicits._
    val df = randomRows(4000, keys = 3, tsRange = 1000, seed = 42).toDF("k", "ts", "id")
    val plain = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("ts").desc, col("id").asc)).cast("long"))
      .filter(col("rn") <= 3)
    val par = ParallelRank.withTopKRank(df, Seq(col("k")),
      Seq(col("ts").desc, col("id").asc), 3, xxhash64(col("id")), "rn2",
      smallThreshold = 0L)
    assert(plain.join(par, Seq("k", "ts", "id")).filter(col("rn") === col("rn2")).count()
      == plain.count())
  }

  // ---- the four rewritten shipped queries: scale path == plain path ----

  private def queryDiff(name: String): Unit = {
    val sf = "/root/testdata/sf0.001"
    def rows(thr: String): Seq[String] = {
      spark.conf.set("graft.window.smallInputRows", thr)
      try graft.SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).toSeq.sorted
      finally spark.conf.unset("graft.window.smallInputRows")
    }
    val plain = rows(Long.MaxValue.toString)
    val segmented = rows("0")
    assert(plain.nonEmpty, s"$name returned no rows")
    assert(plain == segmented, s"$name: segmented path diverges from plain window")
  }

  test("window_rank: salted top-3 equals the plain per-nation window") {
    queryDiff("window_rank")
  }

  test("window_analytics: rank-arithmetic ntile/first/cume equals the plain window") {
    queryDiff("window_analytics")
  }

  test("sample_token_budget: segmented prefix sum equals the plain window") {
    queryDiff("sample_token_budget")
  }

  test("pack_sequences: segmented prefix sum equals the plain window") {
    queryDiff("pack_sequences")
  }

  test("window_pct_rank: segmented percent_rank/cume_dist equals the plain window") {
    queryDiff("window_pct_rank")
  }

  test("agg_percentile: distributed order statistics equal the built-in percentile") {
    queryDiff("agg_percentile")
  }
}
