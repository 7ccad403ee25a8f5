package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential for the incremental curation admission arm: the final
  * manifest rollup of the streamed cadence (screen → within-wave
  * keep-first → persisted-index probe → leakage-consistent split →
  * ManifestLog merge) must EQUAL the batch `pipeline_curate_e2e` over
  * the union of all waves — across a kill/restart between waves, and
  * under wholesale replay (the at-least-once convergence claim).
  */
class StreamingCurateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def writeChunk(base: Path, srcDir: Path, name: String,
                         lines: Seq[String]): Unit = {
    val tmp = base.resolve(name + ".tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, srcDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  test("streamed admission manifest equals the batch curation pipeline, across kill/restart; replay is a no-op") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val expected = graft.SparkEntry.queries("pipeline_curate_e2e")(spark, dir)
      .collect().map(_.toString).toSeq

    // doc-id-ordered waves: the batch keeper (min doc_id per hash) is
    // always the stream's first arrival — the same requirement as
    // every streaming-dedup differential
    val lines = docs.collect().sortBy(_.getLong(0)).map { r =>
      s"""{"doc_id":${r.getLong(0)},"text":"${esc(r.getString(1))}",""" +
        s""""lang":"${esc(r.getString(2))}","source":"${esc(r.getString(3))}"}"""
    }.toSeq
    val per = math.max(1, lines.length / 4 + 1)
    val chunks = lines.grouped(per).toSeq.padTo(4, Seq.empty[String])

    val base = Files.createTempDirectory("graft-curate-stream")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = base.resolve("ckpt").toString
    val manifest = base.resolve("mlog").toString
    val idx = base.resolve("idx").toString

    def start() = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING")
      .option("maxFilesPerTrigger", 1).json(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingCurate.admitWave(df, manifest, idx)
      }
      .option("checkpointLocation", ckpt)
      .start()

    // life 1: waves 0-1 → KILL → life 2: waves 2-3 (fresh query, same
    // checkpoint — the manifest and index recover from disk)
    writeChunk(base, srcDir, "c0.json", chunks(0))
    writeChunk(base, srcDir, "c1.json", chunks(1))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeChunk(base, srcDir, "c2.json", chunks(2))
    writeChunk(base, srcDir, "c3.json", chunks(3))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = StreamingCurate.manifestRollup(spark, manifest)
      .collect().map(_.toString).toSeq
    assert(got == expected, s"streamed $got != batch $expected")

    // wholesale replay: re-admitting the ENTIRE corpus as one wave is
    // a no-op — every hash is already indexed, the manifest version
    // and rollup stay put (the at-least-once convergence argument)
    val vBefore = graft.operators.ManifestLog.currentVersion(spark, manifest)
    StreamingCurate.admitWave(docs, manifest, idx)
    assert(graft.operators.ManifestLog.currentVersion(spark, manifest) == vBefore,
      "replayed admission wrote a new version")
    val again = StreamingCurate.manifestRollup(spark, manifest)
      .collect().map(_.toString).toSeq
    assert(again == expected)

    // and the admitted DOC-LEVEL split assignment is leakage-consistent
    // with the batch rule: every admitted doc's split recomputes from
    // its own keeper id
    val files = graft.operators.ManifestLog.snapshot(spark, manifest)
      .collect().map(_.getString(0)).toIndexedSeq
    val bad = spark.read.parquet(files: _*)
      .withColumn("expect", graft.operators.TextQueries.curateSplit(col("doc_id")))
      .filter(col("split") =!= col("expect")).count()
    assert(bad == 0L)

    // probe plan discipline: the persisted index's parquet scan never
    // sits under a ShuffleExchange — the wave's hashes broadcast INTO
    // the one index scan (at 100 TB the index is scanned once and
    // moved never, the IncrementalDedupSpec contract)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case other                    => other +: other.children.flatMap(walk)
    }
    val probe = StreamingCurate.probeFresh(docs, idx)
    val nodes = walk(probe.queryExecution.executedPlan)
    // the pin has teeth: the probe plan must actually contain the
    // index scan and at least one (wave-sized) exchange
    assert(nodes.exists {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains(idx))
      case _ => false
    }, "probe plan lost the index scan")
    val offenders = nodes.collect { case e: ShuffleExchangeExec => e }
      .flatMap(_.collect { case s: FileSourceScanExec => s })
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(idx)))
    assert(offenders.isEmpty,
      s"index scan under a ShuffleExchange:\n${nodes.head.toString.take(1200)}")
  }

  test("bucketed-index admission: differential unchanged vs batch; probe is a SortMergeJoin with a bucket-aligned, exchange-free index side") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    val expected = graft.SparkEntry.queries("pipeline_curate_e2e")(spark, dir)
      .collect().map(_.toString).toSeq

    val base = Files.createTempDirectory("graft-curate-bkt")
    val manifest = base.resolve("mlog").toString
    val idxPath = base.resolve("bidx").toString
    val tbl = "curate_bidx_" + java.util.UUID.randomUUID().toString.take(6)

    // three doc-id-ordered waves through the bucketed admission
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val waves = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    waves.foreach(w => StreamingCurate.admitWaveBucketed(w, manifest, tbl, idxPath))

    // the admission differential is UNCHANGED by the index layout
    val got = StreamingCurate.manifestRollup(spark, manifest)
      .collect().map(_.toString).toSeq
    assert(got == expected, s"bucketed admission $got != batch $expected")

    // wholesale replay is still a no-op
    val vBefore = graft.operators.ManifestLog.currentVersion(spark, manifest)
    StreamingCurate.admitWaveBucketed(docs, manifest, tbl, idxPath)
    assert(graft.operators.ManifestLog.currentVersion(spark, manifest) == vBefore,
      "replayed bucketed admission wrote a new version")

    // plan pin: the hit-detection join is a SortMergeJoin; the index
    // side reads BUCKETED with no exchange anywhere above its scan —
    // only the (wave-sized) hash side shuffles
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case other                    => other +: other.children.flatMap(walk)
    }
    val probe = StreamingCurate.probeFreshBucketed(docs, tbl)
    val nodes = walk(probe.queryExecution.executedPlan)
    val idxScans = nodes.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("bidx")) => s
    }
    assert(idxScans.nonEmpty, "probe plan lost the bucketed index scan")
    assert(idxScans.forall(_.bucketedScan),
      "index scan lost the bucket spec:\n" + nodes.head.toString.take(1200))
    assert(nodes.exists(_.nodeName.contains("SortMergeJoin")),
      "hit detection did not plan as a SortMergeJoin:\n" + nodes.head.toString.take(1200))
    val offenders = nodes.collect { case e: ShuffleExchangeExec => e }
      .flatMap(_.collect { case s: FileSourceScanExec => s })
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("bidx")))
    assert(offenders.isEmpty,
      s"bucketed index scan under a ShuffleExchange:\n${nodes.head.toString.take(1200)}")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
