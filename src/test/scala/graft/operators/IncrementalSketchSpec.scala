package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL distinct-count index (SketchIndex) probes a PERSISTED
  * per-(group, shard) sketch artifact. The spec proves:
  * (1) the sketch column survives a real parquet round-trip (same
  *     estimates from the reread index as from the in-memory one);
  * (2) the union-of-shards estimate EQUALS the one-shot whole-data
  *     estimate — HLL register state is a per-register max, so shard
  *     merge order and sharding itself cannot change the result;
  * (3) re-unioning an overlapping shard is idempotent (no double
  *     counting — the property per-shard COUNT DISTINCT sums lack);
  * (4) estimates track exact distinct counts within the sketch's
  *     error envelope;
  * (5) the probe plan touches the corpus only through the index: the
  *     events parquet is scanned exactly once (the batch side).
  */
class IncrementalSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def evAll = graft.sources.Tables.events(spark, sf)
  private def batch = evAll.filter(col("event_id") % 10 < 3)
  private def corpus = evAll.filter(col("event_id") % 10 >= 3)
  private val grp = Seq("event_type")
  private def day = to_date(col("ts")).cast("string")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-incsketch-$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  private def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("parquet round-trip: reread index gives identical estimates; union == one-shot") {
    val dir = tmpDir("idx")
    SketchIndex.buildDistinctIndex(corpus, grp, day, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)

    val fromDisk = estimates(
      SketchIndex.estimateWithBatch(reread, batch, grp, col("user_id")))
    val inMem = estimates(SketchIndex.estimateWithBatch(
      SketchIndex.buildDistinctIndex(corpus, grp, day, col("user_id")),
      batch, grp, col("user_id")))
    assert(fromDisk.nonEmpty && fromDisk == inMem)

    // one-shot over ALL rows, sketched in one pass with no sharding —
    // must equal the union-of-shards estimate exactly
    val oneShot = estimates(
      evAll.groupBy(grp.map(col): _*)
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est")))
    assert(fromDisk == oneShot,
      s"union-of-shards $fromDisk != one-shot $oneShot")
  }

  test("idempotence: re-unioning an overlapping shard never double-counts") {
    val index = SketchIndex.buildDistinctIndex(corpus, grp, day, col("user_id"))
    val overlap = SketchIndex.buildDistinctIndex(
      corpus.filter(col("event_id") % 3 === 0), grp,
      concat(day, lit("-re")), col("user_id"))
    val plain = estimates(
      SketchIndex.estimateWithBatch(index, batch, grp, col("user_id")))
    val doubled = estimates(SketchIndex.estimateWithBatch(
      index.unionByName(overlap), batch, grp, col("user_id")))
    assert(plain == doubled, s"overlap changed estimates: $plain vs $doubled")
  }

  test("estimates track exact distinct counts within the sketch envelope") {
    val est = estimates(SketchIndex.estimateWithBatch(
      SketchIndex.buildDistinctIndex(corpus, grp, day, col("user_id")),
      batch, grp, col("user_id")))
    val exact = evAll.groupBy(grp.map(col): _*)
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val relErr = math.abs(est(k) - n).toDouble / n
      assert(relErr <= 0.05, s"$k: est ${est(k)} vs exact $n (rel $relErr)")
    }
  }

  test("probe plan reads events once (batch side) — corpus only through the index") {
    val dir = tmpDir("planidx")
    SketchIndex.buildDistinctIndex(corpus, grp, day, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val probe = SketchIndex.estimateWithBatch(
      spark.read.parquet(dir), batch, grp, col("user_id"))
    probe.collect() // force a concrete executed plan (AQE-final)
    val scans = PlanScans.scanPaths(probe)
    val eventScans = scans.count(_.contains("events.parquet"))
    assert(eventScans == 1, s"expected ONE events scan (the batch), got:\n$scans")
    assert(scans.exists(_.contains(dir)), s"index path not scanned:\n$scans")
  }
}
