package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HistogramIndex, SketchIndex, TextQueries}

/** Kill/restart-from-checkpoint differentials for the four streaming
  * index arms (incremental dedup, HLL sketch, percentile histogram,
  * Misra-Gries heavy hitters): each query runs two LIVES over a file
  * source — two chunks, `stop()`, then the rest of the corpus through
  * a FRESH query resumed from the same checkpoint — and the final
  * output must equal the batch operator over all streamed rows. What
  * this pins beyond the micro-batch-chopping differentials in the
  * per-arm specs: the per-group STATE (keeper ids / HLL registers /
  * value histogram / MG summary) round-trips Spark's state store
  * across a process-level restart and keeps accumulating, and the
  * sink dedups the restart boundary (same exactly-once pattern proven
  * for gap sessions in StreamingSpec).
  *
  * All four comparisons are exact-equality, not tolerances: dedup and
  * percentile are order-independent by construction, HLL registers
  * are per-register maxes, and the heavy-hitters test sizes k above
  * the distinct-token count so the MG summary degenerates to exact
  * counts (the decrement path's order-dependent invariants are gated
  * in StreamingHeavyHittersSpec; state recovery is what is under test
  * here).
  */
class StreamingRestartSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Atomic-publish one chunk file (the file source must never list a
    * partial file — same move trick as StreamingSpec).
    */
  private def writeChunk(base: Path, srcDir: Path, name: String,
                         lines: Seq[String]): Unit = {
    val tmp = base.resolve(name + ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, srcDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Run `start` as two lives over 4 chunks: c0,c1 → kill → c2,c3 →
    * drain. Both lives share srcDir + checkpoint; `start` builds a
    * fresh query each time (resume-from-checkpoint).
    */
  private def twoLives(chunks: Seq[Seq[String]])(start: (Path, String) => StreamingQuery): Path = {
    require(chunks.length == 4, "restart scaffold expects 4 chunks")
    val base = Files.createTempDirectory("graft-restart")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = base.resolve("ckpt").toString
    writeChunk(base, srcDir, "c0.json", chunks(0))
    writeChunk(base, srcDir, "c1.json", chunks(1))
    val q1 = start(srcDir, ckpt)
    q1.processAllAvailable(); q1.stop()
    writeChunk(base, srcDir, "c2.json", chunks(2))
    writeChunk(base, srcDir, "c3.json", chunks(3))
    val q2 = start(srcDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    base
  }

  private def chunk4[T](rows: Seq[T]): Seq[Seq[T]] = {
    val per = math.max(1, rows.length / 4 + 1)
    rows.grouped(per).toSeq.padTo(4, Seq.empty[T])
  }

  /** Update-mode arms land through foreachBatch as parquet appends
    * stamped with the micro-batch id; "final result" = max-bid row
    * per group. A batch replayed at the restart boundary appends
    * identical rows (the arms are deterministic), so the max-bid
    * selection is immune to the at-least-once sink.
    */
  private def updateSink(out: Path)(df: DataFrame, bid: Long): Unit =
    df.withColumn("bid", lit(bid)).write.mode("append").parquet(out.toString)

  test("incremental exact-dedup verdicts survive kill/restart (keeper state recovers)") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batchDf = all.filter(col("doc_id") % 10 < 3)
    val corpus = all.filter(col("doc_id") % 10 >= 3)
    val index = TextQueries.buildExactIndex(corpus)
    val expected = TextQueries.probeExactIndex(index, batchDf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq

    // doc-id order across chunks: the batch keeper (min doc_id) is the
    // stream's first arrival, same requirement as StreamingDedupSpec
    val lines = batchDf.select("doc_id", "text").collect().sortBy(_.getLong(0))
      .map { r =>
        val txt = r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        s"""{"doc_id":${r.getLong(0)},"text":"$txt"}"""
      }.toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingDedup.probeExactIndexStream(index, stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    val got = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(got.nonEmpty && got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  /** The parquet-sink path for a query's src dir (sibling `out`). */
  private def base2(src: Path): Path = {
    val out = src.getParent.resolve("out")
    out
  }

  test("chunk-dedup verdicts survive kill/restart (per-chunk keeper state recovers)") {
    val all = spark.read.parquet(s"$dir/documents.parquet")
    val batchDf = all.filter(col("doc_id") % 10 < 3)
    val index = TextQueries.buildChunkIndex(all.filter(col("doc_id") % 10 >= 3))
    val expected = TextQueries.probeChunkIndex(index, TextQueries.chunkRows(batchDf))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq

    val lines = batchDf.select("doc_id", "text").collect().sortBy(_.getLong(0))
      .map { r =>
        val txt = r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        s"""{"doc_id":${r.getLong(0)},"text":"$txt"}"""
      }.toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingDedup.probeChunkIndexStream(index, stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    val got = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(got.nonEmpty && got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("HLL distinct estimates survive kill/restart (register state recovers)") {
    import spark.implicits._
    val all = graft.sources.Tables.events(spark, dir)
    val batch = all.filter(col("event_id") % 10 < 3)
    val corpus = all.filter(col("event_id") % 10 >= 3)
    val index = SketchIndex.buildDistinctIndex(corpus, Seq("event_type"),
      to_date(col("ts")).cast("string"), col("user_id"))
    val expected = SketchIndex.estimateWithBatch(index, batch, Seq("event_type"),
        col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val lines = batch.select("event_type", "user_id").collect()
      .map(r => s"""{"event_type":"${r.getString(0)}","user_id":${r.getLong(1)}}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingSketch.estimateStream(index, stream, "event_type", "user_id")
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[GroupEstimate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("bid")))
    val maxBid = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (g, _, b) => b == maxBid(g) }
      .map { case (g, e, _) => g -> e }.toMap
    assert(got == expected, s"stream $got != batch $expected")
  }

  test("DAU distinct state survives kill/restart (no double-counted (day, user) pairs)") {
    val batch = graft.SparkEntry.queries("ev_active_users")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lines = graft.sources.Tables.events(spark, dir)
      .select("user_id", "ts_us").collect().sortBy(_.getLong(1))
      .map(r => s"""{"user_id":${r.getLong(0)},"ts_us":${r.getLong(1)}}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("user_id LONG, ts_us LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingActiveUsers.dauStream(stream)
        .writeStream.outputMode("update")
        .foreachBatch((df: DataFrame, bid: Long) => updateSink(base2(src))(df, bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"),
        r.getAs[Long]("bid")))
    // a replayed micro-batch must not re-admit its (day, user) pairs:
    // the LAST emission per day equals the batch distinct exactly
    val maxBid = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (d, _, b) => b == maxBid(d) }
      .map { case (d, v, _) => d -> v }.toMap
    assert(got == batch, s"stream $got != batch $batch")
  }

  test("theta overlap sketches survive kill/restart (k-smallest-hash state recovers, exact here)") {
    import graft.operators.ThetaOps
    val all = graft.sources.Tables.events(spark, dir)
    val batch = all.filter(col("event_id") % 10 < 3)
    val corpus = all.filter(col("event_id") % 10 >= 3)
    val corpusSk = ThetaOps.groupSketches(corpus, "event_type", col("user_id"))
    val batchSk = ThetaOps.groupSketches(batch, "event_type", col("user_id"))
    val expected = batchSk.map { case (g, sb) =>
      g -> (ThetaOps.estimate(sb),
        corpusSk.get(g).map(ThetaOps.unionEstimate(sb, _)).getOrElse(ThetaOps.estimate(sb)),
        corpusSk.get(g).map(ThetaOps.intersectionEstimate(sb, _)).getOrElse(0L))
    }

    val lines = batch.select("event_type", "user_id").collect()
      .map(r => s"""{"event_type":"${r.getString(0)}","user_id":${r.getLong(1)}}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingTheta.overlapStream(corpus, stream, "event_type", "user_id")
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[ThetaEstimate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[Long]("est_stream"),
        r.getAs[Long]("est_union"), r.getAs[Long]("est_overlap"), r.getAs[Long]("bid")))
    val maxBid = sink.groupBy(_._1).view.mapValues(_.map(_._5).max).toMap
    val got = sink.filter { case (g, _, _, _, b) => b == maxBid(g) }
      .map { case (g, s, u, o, _) => g -> (s, u, o) }.toMap
    assert(got == expected, s"stream $got != batch $expected")
  }

  test("percentile histograms survive kill/restart (histogram state recovers, bit-exact)") {
    val li = graft.sources.Tables.lineitem(spark, dir)
    val batch = li.filter(col("l_orderkey") % 10 < 3)
    val corpus = li.filter(col("l_orderkey") % 10 >= 3)
    val index = HistogramIndex.buildValueHistIndex(corpus, Seq("l_returnflag"),
      year(col("l_shipdate")), col("l_quantity"))
    val expected = HistogramIndex.percentileWithBatch(index, batch, "l_returnflag",
        col("l_quantity"), 0.5, "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val lines = batch.select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect().map(r =>
        s"""{"l_returnflag":"${r.getString(0)}","l_quantity":${r.getDouble(1)}}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("l_returnflag STRING, l_quantity DOUBLE")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingPercentile.percentileStream(index, stream,
        "l_returnflag", "l_quantity", 0.5)
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[PctUpdate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[Double]("pct"),
        r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (g, _, v) => v == maxVer(g) }
      .map { case (g, m, _) => g -> m }.toMap
    assert(got == expected, s"stream $got != batch $expected")
  }

  test("initial state covers a group whose FIRST arrival lands after the restart (percentile seed survives)") {
    import spark.implicits._
    // group b is in the index but streams nothing before the kill: if
    // initial state applied only to keys with batch-0 data, b would
    // restart from an empty histogram and report median{30,40} = 35.
    // Spark writes initial state for EVERY key at batch 0 (the
    // function runs with an empty row iterator), so b's post-restart
    // median is over seed {10,20} ∪ arrivals {30,40} = 25 — the
    // documented bit-identical-to-batch contract holds for
    // late-first-seen groups too.
    val index = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 1L), ("a", 4.0, 1L),
      ("b", 10.0, 1L), ("b", 20.0, 1L)).toDF("g", "value", "cnt")
    val chunks = Seq(
      Seq("""{"g":"a","v":5}"""), Seq("""{"g":"a","v":6}"""),   // life 1
      Seq("""{"g":"b","v":30}"""), Seq("""{"g":"b","v":40}""")) // life 2
    val base = twoLives(chunks) { (src, ckpt) =>
      val stream = spark.readStream.schema("g STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingPercentile.percentileStream(index, stream, "g", "v", 0.5)
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[PctUpdate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[Double]("pct"),
        r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (g, _, v) => v == maxVer(g) }
      .map { case (g, m, _) => g -> m }.toMap
    assert(got("b") == 25.0, s"late-first-seen group lost its seed: ${got("b")}")
    assert(got("a") == 3.5, s"pre-restart group drifted: ${got("a")}")
  }

  test("initial state covers a group whose FIRST arrival lands after the restart (HLL index survives)") {
    import spark.implicits._
    val corpus = (1L to 40L).map(u => ("a", u)) ++ (100L to 130L).map(u => ("b", u))
    val corpusDf = corpus.toDF("g", "user_id")
    val index = SketchIndex.buildDistinctIndex(corpusDf, Seq("g"),
      (col("user_id") % 4).cast("string"), col("user_id"))
    // life 1 streams only a; b's first arrivals (2 known + 2 new
    // users) land after the restart — the estimate must still count
    // the 31 corpus users it never re-sees
    val chunks = Seq(
      Seq("""{"g":"a","user_id":1}"""), Seq("""{"g":"a","user_id":200}"""),
      Seq("""{"g":"b","user_id":100}""", """{"g":"b","user_id":300}"""),
      Seq("""{"g":"b","user_id":301}"""))
    val streamed = Seq(("a", 1L), ("a", 200L), ("b", 100L), ("b", 300L), ("b", 301L))
    val expected = SketchIndex.estimateWithBatch(index, streamed.toDF("g", "user_id"),
        Seq("g"), col("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = twoLives(chunks) { (src, ckpt) =>
      val stream = spark.readStream.schema("g STRING, user_id LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingSketch.estimateStream(index, stream, "g", "user_id")
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[GroupEstimate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("bid")))
    val maxBid = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (g, _, b) => b == maxBid(g) }
      .map { case (g, e, _) => g -> e }.toMap
    assert(got == expected, s"stream $got != batch $expected")
    // at these cardinalities HLL is exact: b = 31 corpus ∪ {100,300,301} = 33
    assert(got("b") == 33L, s"late-first-seen group lost its index: ${got("b")}")
  }

  test("funnel stage state survives kill/restart (per-user stage timestamps recover)") {
    val dir1 = dir
    val expected = graft.SparkEntry.queries("ev_funnel")(spark, dir1).collect()
      .map(r => r.getAs[Long]("user_id") -> (
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    // event-time replay order (same contract as StreamingFunnelSpec)
    val lines = graft.sources.Tables.events(spark, dir1)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .collect().sortBy(r => (r.getLong(2), r.getLong(3)))
      .map(r => s"""{"user_id":${r.getLong(0)},"event_type":"${r.getString(1)}","ts_us":${r.getLong(2)},"event_id":${r.getLong(3)}}""")
      .toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING, ts_us LONG, event_id LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingFunnel.funnelStream(stream)
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[FunnelUpdate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getSeq[Long](r.fieldIndex("stage_us")).toIndexedSeq,
        r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val got = sink.filter { case (u, _, v) => v == maxVer(u) }
      .map { case (u, st, _) => u -> (st(0), st(1), st(2)) }.toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("retention cohort/last-day state survives kill/restart (no double-counted days)") {
    val expected = graft.SparkEntry.queries("ev_retention")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // event-time replay order (same contract as StreamingRetentionSpec)
    val lines = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"))
      .collect().sortBy(r => (r.getLong(1), r.getLong(2)))
      .map(r => s"""{"user_id":${r.getLong(0)},"ts_us":${r.getLong(1)},"event_id":${r.getLong(2)}}""")
      .toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("user_id LONG, ts_us LONG, event_id LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingRetention.retentionHits(stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    // hits are unique per (user, offset) by construction, so distinct()
    // absorbs any at-least-once boundary replay before aggregation
    val got = spark.read.parquet(base.resolve("out").toString)
      .distinct().groupBy("cohort_day", "day_offset").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("heavy-hitter summaries survive kill/restart (MG state recovers; k>distinct ⇒ exact)") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type").as("g"), col("user_id").cast("string").as("tok"))
    // k=64 ≥ 15 distinct users: MG never decrements, the summary IS
    // the exact per-(group, token) count — order-independent equality
    val expected = ev.groupBy("g", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val lines = ev.collect()
      .map(r => s"""{"group":"${r.getString(0)}","token":"${r.getString(1)}"}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("group STRING, token STRING")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingHeavyHitters.topTokensStream(stream, 64)
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[HHUpdate], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    val sink = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getAs[String]("group"), r.getAs[String]("token"),
        r.getAs[Long]("approx_cnt"), r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val got = sink.filter { case (g, _, _, v) => v == maxVer(g) }
      .map { case (g, t, c, _) => (g, t) -> c }.toMap
    assert(got == expected,
      s"only-batch=${(expected.keySet -- got.keySet).take(3)} diff=${
        expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(3)}")
  }

  test("count-min cells survive kill/restart (sketch-array state recovers, exact)") {
    import spark.implicits._
    import graft.operators.CmsOps
    val docRows = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getString(2)))
    // batch truth: per-lang one-shot sketches
    val expected = docRows.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
      CmsOps.buildCms(rs.map(_._2).toSeq.toDF("tok"), col("tok"))
        .collect().map(r => (lang, r.getInt(0), r.getLong(1)) -> r.getLong(2)).toSeq
    }.toMap

    val lines = docRows.map { case (l, t) => s"""{"lang":"$l","tok":"$t"}""" }.toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("lang STRING, tok STRING")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingCms.cmsCells(stream, "lang", "tok")
        .writeStream.outputMode("update")
        .foreachBatch((ds: org.apache.spark.sql.Dataset[CmsCell], bid: Long) =>
          updateSink(base2(src))(ds.toDF(), bid))
        .option("checkpointLocation", ckpt)
        .start()
    }
    // counts are monotone and a cell's last update carries its final
    // total, so max-per-cell absorbs both chopping and any replayed
    // batch at the restart boundary
    val got = spark.read.parquet(base.resolve("out").toString)
      .groupBy("group", "d", "cell").agg(max("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2).toLong) -> r.getLong(3))
      .toMap
    assert(got.nonEmpty && got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("gap rows survive kill/restart (last-seen-hour state recovers)") {
    val evs = graft.sources.Tables.events(spark, dir)
      .select("event_type", "ts_us")
    val expected = StreamingGaps.gapsBatch(evs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(expected.nonEmpty, "sf0.001 must contain hourly gaps")
    val lines = evs.collect().sortBy(_.getLong(1)).map(r =>
      s"""{"event_type":"${r.getString(0)}","ts_us":${r.getLong(1)}}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream.schema("event_type STRING, ts_us LONG")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingGaps.gapStream(stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    val got = spark.read.parquet(base.resolve("out").toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("attribution last-touch state survives kill/restart (per-user touch pair recovers; event_id keys the at-least-once sink)") {
    val all = graft.sources.Tables.events(spark, dir)
    val expected = graft.SparkEntry.queries("ev_attribution_last_touch")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val lines = all.select("user_id", "event_type", "ts_us", "event_id", "value")
      .collect().sortBy(r => (r.getLong(2), r.getLong(3))) // event-time order
      .map(r => s"""{"user_id":${r.getLong(0)},"event_type":"${r.getString(1)}",""" +
        s""""ts_us":${r.getLong(2)},"event_id":${r.getLong(3)},"value":${r.getDouble(4)}}""")
      .toIndexedSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING, ts_us LONG, event_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingAttribution.attributionStream(stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    // a batch replayed at the restart boundary appends identical rows;
    // event_id is the natural key, so distinct-by-key == exactly-once
    val got = spark.read.parquet(base.resolve("out").toString)
      .dropDuplicates("event_id")
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("revenue_cents").as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("semantic-dedup verdicts survive kill/restart (per-bucket kept-representative vectors recover)") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val dim = 64
    val bits = graft.operators.AnnQueries.SemBits
    val tau = graft.operators.AnnQueries.SemTauFp
    val expected = graft.ann.SemDedup
      .dedupSemanticSequential(emb, dim, bits, tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val lines = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().sortBy(_.getLong(0))
      .map(r => s"""{"vec_id":${r.getLong(0)},"embedding":[${
        r.getSeq[Float](1).mkString(",")}]}""").toIndexedSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingSemDedup.verdictStream(stream, dim, bits, tau)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    // a batch replayed at the restart boundary appends identical rows;
    // vec_id keys the at-least-once sink
    val got = spark.read.parquet(base.resolve("out").toString)
      .dropDuplicates("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(got == expected,
      s"only-batch=${(expected -- got).take(3)} only-stream=${(got -- expected).take(3)}")
  }

  test("multi-touch attribution state survives kill/restart (per-user touch LIST recovers; (event_id, channel) keys the sink)") {
    // time-decay mode — the stronger differential: recovering the list
    // wrong by one touch changes a weight, not just a count
    val expected = graft.SparkEntry.queries("ev_attribution_time_decay")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val lines = graft.sources.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts_us", "event_id", "value")
      .collect().sortBy(r => (r.getLong(2), r.getLong(3))) // event-time order
      .map(r => s"""{"user_id":${r.getLong(0)},"event_type":"${r.getString(1)}",""" +
        s""""ts_us":${r.getLong(2)},"event_id":${r.getLong(3)},"value":${r.getDouble(4)}}""")
      .toIndexedSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("user_id LONG, event_type STRING, ts_us LONG, event_id LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingMultiTouch.creditStream(stream, decay = true)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    // a batch replayed at the restart boundary appends identical rows;
    // (event_id, channel) is the natural key → distinct == exactly-once
    val got = spark.read.parquet(base.resolve("out").toString)
      .dropDuplicates("event_id", "channel")
      .groupBy("channel")
      .agg(count(lit(1)).as("n"), sum("credit_fp").as("fp"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("transition pairs survive kill/restart (per-user last-event state recovers)") {
    val expected = graft.SparkEntry.queries("ev_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val lines = graft.sources.Tables.events(spark, dir)
      .select("user_id", "ts_us", "event_id", "event_type")
      .collect().sortBy(r => (r.getLong(1), r.getLong(2)))
      .map(r => s"""{"user_id":${r.getLong(0)},"ts_us":${r.getLong(1)},""" +
        s""""event_id":${r.getLong(2)},"event_type":"${r.getString(3)}"}""").toSeq
    val base = twoLives(chunk4(lines)) { (src, ckpt) =>
      val stream = spark.readStream
        .schema("user_id LONG, ts_us LONG, event_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", 1).json(src.toString)
      StreamingTransitions.transitionStream(stream)
        .writeStream.format("parquet")
        .option("path", base2(src).toString)
        .option("checkpointLocation", ckpt)
        .start()
    }
    val got = spark.read.parquet(base.resolve("out").toString)
      .groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got == expected,
      s"only-batch=${(expected.toSet -- got.toSet).take(3)} only-stream=${(got.toSet -- expected.toSet).take(3)}")
  }
}
