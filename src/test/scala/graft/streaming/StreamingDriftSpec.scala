package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.sources.Tables

/** Integer element sums are insertion-order-independent and the final
  * step is the batch operator's exact arithmetic, so the last streamed
  * drift row per label must equal the batch `emb_drift` BIT-FOR-BIT
  * under any micro-batch chopping of the incoming vectors.
  */
class StreamingDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("final streamed drift equals batch emb_drift bit-for-bit (chopped vector stream)") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") % 10 >= 3)
    val batch = emb.filter(col("vec_id") % 10 < 3)

    val expected = SparkEntry.queries("emb_drift")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue() ->
        (r.getLong(1), r.getLong(3))).toMap

    // chop the batch into 3 parquet files, stream one per trigger
    val qdir = Files.createTempDirectory("graft_drift").toString
    batch.select("label", "embedding").repartition(3)
      .write.mode("overwrite").parquet(qdir)
    val schema = spark.read.parquet(qdir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(qdir)

    val out = StreamingDrift.driftStream(
      corpus.select("label", "embedding"), stream, graft.operators.AnnQueries.EmbDim)
    val q = out.writeStream.format("memory").queryName("drift_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    val sink = spark.table("drift_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val got = sink.filter { case (l, _, _, v) => v == maxVer(l) }
      .map { case (l, nb, d, _) => l -> (nb, d) }.toMap
    assert(got == expected, s"stream $got != batch $expected")
  }

  test("drift sums survive kill/restart (per-label state recovers, bit-exact)") {
    import java.nio.file.StandardCopyOption
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") % 10 >= 3)
    val batch = emb.filter(col("vec_id") % 10 < 3)
    val expected = SparkEntry.queries("emb_drift")(spark, dir)
      .collect().map(r => r.getAs[Number](0).longValue() ->
        (r.getLong(1), r.getLong(3))).toMap

    // 4 parquet chunk files published atomically; two lives over a
    // shared checkpoint with a stop between waves
    val root = Files.createTempDirectory("graft_drift_restart")
    val srcDir = root.resolve("src"); Files.createDirectories(srcDir)
    val sinkDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    def publish(i: Int): Unit = {
      val tmp = root.resolve(s"t$i").toString
      batch.filter(col("vec_id") % 4 === i).select("label", "embedding")
        .coalesce(1).write.parquet(tmp)
      val part = java.nio.file.Paths.get(tmp).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      Files.move(part, srcDir.resolve(s"c$i.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }
    val schema = batch.select("label", "embedding").schema
    def startLife() = StreamingDrift.driftStream(
        corpus.select("label", "embedding"),
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(srcDir.toString),
        graft.operators.AnnQueries.EmbDim)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[DriftUpdate], bid: Long) =>
        ds.toDF().withColumn("bid", lit(bid)).write.mode("append").parquet(sinkDir); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    publish(0); publish(1)
    val q1 = startLife(); q1.processAllAvailable(); q1.stop()
    publish(2); publish(3)
    val q2 = startLife(); q2.processAllAvailable(); q2.stop()

    val sink = spark.read.parquet(sinkDir).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("n_batch"),
        r.getAs[Long]("l2sq_fp"), r.getAs[Long]("version")))
    val maxVer = sink.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val got = sink.filter { case (l, _, _, v) => v == maxVer(l) }
      .map { case (l, nb, d, _) => l -> (nb, d) }.toMap
    assert(got == expected, s"restarted stream $got != batch $expected")
  }
}
