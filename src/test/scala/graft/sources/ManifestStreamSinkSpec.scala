package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ManifestLog

/** The STREAMING write face: `df.writeStream.format(manifest)` must
  * equal the foreachBatch cadence across a kill/restart, and a
  * replayed epoch must be a VERSION-LEVEL no-op (the at-least-once →
  * exactly-once-versions claim).
  */
class ManifestStreamSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val fmt = classOf[ManifestBatchSource].getName

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def writeChunk(srcDir: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = srcDir.resolveSibling(name + ".tmp")
    Files.writeString(tmp,
      rows.map { case (k, v) => s"""{"k":$k,"v":"$v"}""" }.mkString("", "\n", "\n"))
    Files.move(tmp, srcDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  test("writeStream face across kill/restart equals the foreachBatch cadence; one version per micro-batch") {
    val base = Files.createTempDirectory("mss-e2e")
    val srcDir = base.resolve("src"); Files.createDirectories(srcDir)
    val face = base.resolve("face").toString
    val twin = base.resolve("twin").toString
    val ckFace = base.resolve("ck-face").toString
    val ckTwin = base.resolve("ck-twin").toString

    val waves = Seq(
      (0L until 40L).map(k => (k, s"a$k")),
      (40L until 70L).map(k => (k, s"b$k")),
      (70L until 90L).map(k => (k, s"c$k")),
      (90L until 120L).map(k => (k, s"d$k")))

    def startFace() = spark.readStream.schema("k LONG, v STRING")
      .option("maxFilesPerTrigger", 1).json(srcDir.toString)
      .writeStream.outputMode("append").format(fmt)
      .option("path", face).option("statsCol", "k").option("files", "2")
      .option("checkpointLocation", ckFace)
      .start()

    // the reference cadence: the same waves through foreachBatch into
    // ManifestLog's native append (bootstrap on first contact)
    def startTwin() = spark.readStream.schema("k LONG, v STRING")
      .option("maxFilesPerTrigger", 1).json(srcDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (ManifestLog.currentVersion(df.sparkSession, twin) == 0)
          ManifestLog.write(df, "k", twin, files = 2)
        else ManifestLog.append(df, "k", twin, files = 2)
      }
      .option("checkpointLocation", ckTwin)
      .start()

    // life 1: waves 0-1 → KILL → life 2: waves 2-3 (same checkpoints)
    writeChunk(srcDir, "w0.json", waves(0))
    writeChunk(srcDir, "w1.json", waves(1))
    val f1 = startFace(); f1.processAllAvailable(); f1.stop()
    val t1 = startTwin(); t1.processAllAvailable(); t1.stop()
    writeChunk(srcDir, "w2.json", waves(2))
    writeChunk(srcDir, "w3.json", waves(3))
    val f2 = startFace(); f2.processAllAvailable(); f2.stop()
    val t2 = startTwin(); t2.processAllAvailable(); t2.stop()

    assert(canon(ManifestLog.read(spark, face)) ==
      canon(ManifestLog.read(spark, twin)),
      "streaming face diverged from the foreachBatch cadence")
    assert(ManifestLog.read(spark, face).count() == waves.map(_.size).sum)
    assert(ManifestLog.currentVersion(spark, face) == 4,
      "expected exactly one table version per micro-batch")
    // the txn cursor survives the restart: life 2's batches continued
    // the SAME appId (the checkpoint-stable query id)
    val qid = f2.id.toString
    assert(ManifestLog.lastTxn(spark, face, qid).contains(3L),
      s"txn cursor for query $qid should sit at the last epoch")
  }

  test("replayed epoch is a version-level no-op — across a sink restart and an interleaved foreign commit; racing batch dirs never leak") {
    val base = Files.createTempDirectory("mss-replay")
    val tbl = base.resolve("tbl").toString
    def wave(ks: Range, tag: String) =
      spark.range(ks.start, ks.end).select(col("id").as("k"),
        concat(lit(tag), col("id")).as("v"))
    def sink() = new ManifestBatchSource().createSink(spark.sqlContext,
      Map("path" -> tbl, "statsCol" -> "k", "files" -> "2", "txnAppId" -> "app-1"),
      Nil, OutputMode.Append())

    val s1 = sink()
    s1.addBatch(0, wave(0 until 30, "a"))
    s1.addBatch(1, wave(30 until 50, "b"))
    assert(ManifestLog.currentVersion(spark, tbl) == 2)
    assert(ManifestLog.lastTxn(spark, tbl, "app-1").contains(1L))

    // a foreign writer commits BETWEEN the epoch and its replay — the
    // txn walk must find the marker past the interleaved version
    ManifestLog.append(wave(1000 until 1010, "x"), "k", tbl, files = 1)
    assert(ManifestLog.currentVersion(spark, tbl) == 3)

    // "restart": a fresh sink instance replays the last epoch
    sink().addBatch(1, wave(30 until 50, "b"))
    assert(ManifestLog.currentVersion(spark, tbl) == 3,
      "replayed epoch must publish no version")
    // and an older epoch replays to a no-op too
    sink().addBatch(0, wave(0 until 30, "a"))
    assert(ManifestLog.currentVersion(spark, tbl) == 3)

    // the next real epoch commits
    sink().addBatch(2, wave(50 until 60, "c"))
    assert(ManifestLog.currentVersion(spark, tbl) == 4)
    assert(ManifestLog.lastTxn(spark, tbl, "app-1").contains(2L))
    assert(ManifestLog.read(spark, tbl).count() == 30 + 20 + 10 + 10)

    // replays wrote NOTHING (the epoch screen fires before any file
    // lands) — only the 4 committed mutations' batch dirs exist
    val bDirs = new java.io.File(tbl).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b-"))
    assert(bDirs.length == 4, // appendStream epochs 0,1,2 + the foreign append
      s"orphaned batch dirs leaked: ${bDirs.map(_.getName).mkString(", ")}")

    // a second app keys its own cursor independently
    assert(ManifestLog.lastTxn(spark, tbl, "app-2").isEmpty)
  }

  test("non-append output modes are rejected with the foreachBatch pointer") {
    val base = Files.createTempDirectory("mss-mode")
    val ex = intercept[IllegalArgumentException] {
      new ManifestBatchSource().createSink(spark.sqlContext,
        Map("path" -> base.resolve("t").toString, "statsCol" -> "k"),
        Nil, OutputMode.Complete())
    }
    assert(ex.getMessage.contains("foreachBatch"))
  }
}
