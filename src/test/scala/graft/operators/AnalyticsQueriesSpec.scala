package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavior checks for the round-14 analytics additions (ev_ohlc,
  * ev_rate_anomaly, agg_mode_median, pack_shard_balance). The DuckDB
  * oracles are the exactness gate; these pin the semantic properties
  * a user relies on — tie-break rules, the all-integer spike algebra,
  * the snake balance guarantee — and the segmented==plain plan swap.
  */
class AnalyticsQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("min_by on a (ts, id) struct breaks timestamp ties by the id — the oracle's HUGEINT key packing") {
    import spark.implicits._
    val df = Seq(
      // two rows at the SAME timestamp: the lower event_id must win
      ("a", 100L, 2L, 20.0), ("a", 100L, 1L, 10.0), ("a", 200L, 3L, 30.0),
      ("b", 50L, 9L, 9.0)
    ).toDF("k", "ts_us", "event_id", "value")
    val got = df.groupBy("k").agg(
      min_by(col("value"), struct(col("ts_us"), col("event_id"))).as("open"),
      max_by(col("value"), struct(col("ts_us"), col("event_id"))).as("close"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("a") == (10.0, 30.0), s"tie-break wrong: ${got("a")}")
    assert(got("b") == (9.0, 9.0))
  }

  test("ev_ohlc: extrema bracket open/close, counts positive, buckets ordered") {
    val rows = SparkEntry.queries("ev_ohlc")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (open, close) = (r.getAs[Double]("open"), r.getAs[Double]("close"))
      val (high, low) = (r.getAs[Double]("high"), r.getAs[Double]("low"))
      assert(low <= open && open <= high, s"open outside [low, high]: $r")
      assert(low <= close && close <= high, s"close outside [low, high]: $r")
      assert(r.getAs[Long]("n_events") > 0)
    }
    // single-event buckets must have open == close == high == low
    val singles = rows.filter(_.getAs[Long]("n_events") == 1L)
    assert(singles.nonEmpty)
    singles.foreach { r =>
      assert(r.getAs[Double]("open") == r.getAs[Double]("close") &&
        r.getAs[Double]("high") == r.getAs[Double]("low"))
    }
  }

  test("ev_rate_anomaly: med/mad are per-type constants and the spike flag is exactly the integral rule") {
    val rows = SparkEntry.queries("ev_rate_anomaly")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the published flag must equal the recomputed all-integer rule
    rows.foreach { r =>
      val expect = 4 * r.getAs[Long]("cnt") >
        2 * r.getAs[Long]("med_x2") + 3 * r.getAs[Long]("mad_x4")
      assert(r.getAs[Boolean]("spike") == expect, s"flag mismatch: $r")
    }
    // med_x2 equals 2x the interpolated median of the type's counts
    def median2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val r = 0.5 * (s.length - 1)
      val (k0, k1) = (math.floor(r).toInt, math.ceil(r).toInt)
      s(k0) + s(k1) // == 2 * interpolated median for p = 0.5
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("med_x2")).distinct.length == 1)
      assert(rs.map(_.getAs[Long]("mad_x4")).distinct.length == 1)
      val cnts = rs.map(_.getAs[Long]("cnt")).toSeq
      val med2 = median2(cnts)
      assert(rs.head.getAs[Long]("med_x2") == med2)
      val dev2s = cnts.map(c => math.abs(2 * c - med2))
      assert(rs.head.getAs[Long]("mad_x4") == median2(dev2s))
    }
  }

  test("agg_mode_median: mode is the count argmax with lexicographic tie-break; median brackets hold") {
    val rows = SparkEntry.queries("agg_mode_median")(spark, dir).collect()
    assert(rows.nonEmpty)
    val cust = graft.sources.Tables.customer(spark, dir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    rows.foreach { r =>
      val nk = r.getAs[Int]("c_nationkey")
      val mine = cust.filter(_._1 == nk)
      val byCnt = mine.groupBy(_._2).view.mapValues(_.length).toMap
      val want = byCnt.toSeq.sortBy { case (seg, n) => (-n, seg) }.head
      assert(r.getAs[String]("mode_seg") == want._1, s"nation $nk mode")
      assert(r.getAs[Long]("mode_n") == want._2.toLong)
      assert(r.getAs[Long]("n") == mine.length.toLong)
      val bals = mine.map(_._3).sorted
      val med = r.getAs[Double]("median_bal")
      assert(med >= bals.head && med <= bals.last)
      // at least half the values on each side of the median
      assert(bals.count(_ <= med) * 2 >= bals.length)
      assert(bals.count(_ >= med) * 2 >= bals.length)
    }
  }

  test("pack_shard_balance: exact recompute, full shard coverage, snake imbalance <= heaviest doc") {
    val rows = SparkEntry.queries("pack_shard_balance")(spark, dir).collect()
    assert(rows.length == CurationQueries.NShards)
    assert(rows.map(_.getAs[Long]("shard_id")).sorted.toSeq ==
      (0L until CurationQueries.NShards).toSeq)
    // client-side replay of the full deal
    val toks = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").count(_.nonEmpty).toLong))
    val ranked = toks.sortBy { case (id, n) => (-n, id) }.zipWithIndex
    val expected = ranked.groupBy { case (_, i) =>
      val (wave, pos) = (i / CuQ.NShards, i % CuQ.NShards)
      if (wave % 2 == 0) pos else CuQ.NShards - 1 - pos
    }.view.mapValues { g =>
      (g.length.toLong, g.map(_._1._2).sum, g.map(_._1._2).max, g.map(_._1._1).min)
    }.toMap
    rows.foreach { r =>
      val sid = r.getAs[Long]("shard_id").toInt
      val (nd, st, mt, fd) = expected(sid)
      assert(r.getAs[Long]("n_docs") == nd, s"shard $sid n_docs")
      assert(r.getAs[Long]("sum_toks") == st, s"shard $sid sum_toks")
      assert(r.getAs[Long]("max_toks") == mt, s"shard $sid max_toks")
      assert(r.getAs[Long]("first_doc") == fd, s"shard $sid first_doc")
    }
    val sums = rows.map(_.getAs[Long]("sum_toks"))
    val heaviest = toks.map(_._2).max
    assert(sums.max - sums.min <= heaviest,
      s"imbalance ${sums.max - sums.min} exceeds heaviest doc $heaviest")
  }

  test("pack_shard_balance: the forced segmented rank path equals the plain-window plan") {
    val plain = SparkEntry.queries("pack_shard_balance")(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("graft.window.smallInputRows", "0")
    try {
      val seg = SparkEntry.queries("pack_shard_balance")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(seg == plain)
    } finally spark.conf.unset("graft.window.smallInputRows")
  }

  test("dedup_bloom_screen: zero false negatives ever; false-positive rate under the design bound") {
    val rows = SparkEntry.queries("dedup_bloom_screen")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the one-sided Bloom guarantee: an actual dup is NEVER 'new'
    rows.filter(_.getAs[Boolean]("is_dup")).foreach { r =>
      assert(r.getAs[String]("verdict") == "maybe_dup", s"false negative: $r")
    }
    // FP rate over the non-dups: design bound (1-e^(-Kn/M))^K with
    // generous headroom for the small-sample variance
    val nonDup = rows.filter(!_.getAs[Boolean]("is_dup"))
    val fp = nonDup.count(_.getAs[String]("verdict") == "maybe_dup")
    assert(nonDup.nonEmpty)
    assert(fp.toDouble / nonDup.length <= 0.15,
      s"FP rate ${fp.toDouble / nonDup.length} (fp=$fp of ${nonDup.length})")
  }

  test("text_vocab_coverage: ranks dense, counts non-increasing, coverage monotone to the cum/total ratio") {
    val rows = SparkEntry.queries("text_vocab_coverage")(spark, dir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == (1L to 20L))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts not sorted")
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("cnt")
      assert(r.getAs[Long]("cum") == cum)
    }
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage not monotone")
    assert(cov.last > 0.0 && cov.last <= 1.0)
  }

  private val CuQ = CurationQueries
}
