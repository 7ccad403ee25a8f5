package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The value-histogram percentile index (HistogramIndex) probes a
  * PERSISTED per-(group, shard) count artifact. The spec proves:
  * (1) the index survives a parquet round-trip (identical medians);
  * (2) the incremental median is BIT-IDENTICAL to the built-in
  *     `percentile` over all rows — counts merge by summation, so
  *     sharding cannot change the merged histogram;
  * (3) the probe plan touches the corpus only through the index: the
  *     lineitem parquet is scanned exactly once (the batch side).
  */
class HistogramIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def li = graft.sources.Tables.lineitem(spark, sf)
  private def batch = li.filter(col("l_orderkey") % 10 < 3)
  private def corpus = li.filter(col("l_orderkey") % 10 >= 3)

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-hist-$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def medians(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("parquet round-trip: identical medians; incremental == built-in percentile, bit-exact") {
    val dir = tmpDir("idx")
    HistogramIndex.buildValueHistIndex(corpus, Seq("l_returnflag"),
        year(col("l_shipdate")), col("l_quantity"))
      .write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)

    val fromDisk = medians(HistogramIndex.percentileWithBatch(
      reread, batch, "l_returnflag", col("l_quantity"), 0.5, "m"))
    val inMem = medians(HistogramIndex.percentileWithBatch(
      HistogramIndex.buildValueHistIndex(corpus, Seq("l_returnflag"),
        year(col("l_shipdate")), col("l_quantity")),
      batch, "l_returnflag", col("l_quantity"), 0.5, "m"))
    assert(fromDisk.nonEmpty && fromDisk == inMem)

    // the built-in over ALL rows — exact equality, not a tolerance:
    // same counts, same weighted-interpolation arithmetic
    val builtin = medians(li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("m")))
    assert(fromDisk == builtin, s"incremental $fromDisk != built-in $builtin")
  }

  test("probe plan reads lineitem once (batch side) — corpus only through the index") {
    val dir = tmpDir("planidx")
    HistogramIndex.buildValueHistIndex(corpus, Seq("l_returnflag"),
        year(col("l_shipdate")), col("l_quantity"))
      .write.mode("overwrite").parquet(dir)
    val probe = HistogramIndex.percentileWithBatch(
      spark.read.parquet(dir), batch, "l_returnflag", col("l_quantity"), 0.5, "m")
    probe.collect()
    val scans = PlanScans.scanPaths(probe)
    assert(scans.count(_.contains("lineitem.parquet")) == 1,
      s"expected ONE lineitem scan (the batch), got:\n$scans")
    assert(scans.exists(_.contains(dir)), s"index path not scanned:\n$scans")
  }
}
