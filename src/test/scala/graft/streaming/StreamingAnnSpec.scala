package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Similarity
import graft.sources.Tables

/** The streamed IVF probe is the batch probe applied per micro-batch
  * (stream-static joins, stateless top-k), so its output must equal
  * the batch `ivfProbe` BYTE-FOR-BYTE — cosine bits included — under
  * any chopping of the query set.
  */
class StreamingAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("streamed IVF probe equals batch ivfProbe byte-for-byte (chopped query stream)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter(col("vec_id") % 10 >= 3)
    val queries = emb.filter(col("vec_id") % 10 < 3)
    val n = emb.count()
    val (nlist, nprobe) = Similarity.autoIvfParams(n)
    val cents = Similarity.ivfCentroids(corpus, nlist)
    val idx = Similarity.ivfAssign(corpus, cents)

    val k = 10
    val expected = Similarity.ivfProbe(idx, emb, queries, cents, k, nprobe, numRows = n)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(expected.nonEmpty)

    // chop the query set into 3 parquet files, stream one per batch
    val qdir = Files.createTempDirectory("graft_annq").toString
    queries.select("vec_id", "embedding").repartition(3)
      .write.mode("overwrite").parquet(qdir)
    val schema = spark.read.parquet(qdir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(qdir)

    val out = StreamingAnn.ivfProbeStream(idx, emb, stream, cents, k, nprobe)
    val q = out.writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ann_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(got == expected,
      s"stream-only=${(got -- expected).take(5)} batch-only=${(expected -- got).take(5)}")
  }

  test("streamed FILTERED IVF probe equals the batch filtered probe byte-for-byte; every neighbor obeys the filter") {
    // the online RAG shape: "top-k WHERE label ∈ allowed" against a
    // live query stream — the label predicate restricts the ASSIGN
    // table (emb_ann_ivf_filtered's composition, index never rebuilt),
    // and the probe arm runs unchanged on the filtered index
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val (nlist, nprobe) = Similarity.autoIvfParams(n)
    val cents = Similarity.ivfCentroids(emb, nlist)
    val allowed = emb.filter(col("label").isin(1, 5, 9))
    val idx = Similarity.ivfAssign(emb, cents)
      .join(allowed.select(col("vec_id").as("nid")), Seq("nid"), "left_semi")
    val queries = emb.filter(col("vec_id") < 20)

    val k = 5
    val expected = Similarity.ivfProbe(idx, emb, queries, cents, k, nprobe, numRows = n)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(expected.nonEmpty)

    val qdir = Files.createTempDirectory("graft_annqf").toString
    queries.select("vec_id", "embedding").repartition(3)
      .write.mode("overwrite").parquet(qdir)
    val stream = spark.readStream.schema(spark.read.parquet(qdir).schema)
      .option("maxFilesPerTrigger", 1).parquet(qdir)
    val out = StreamingAnn.ivfProbeStream(idx, emb, stream, cents, k, nprobe)
    val q = out.writeStream.format("memory").queryName("ann_stream_f")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ann_stream_f").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(got == expected,
      s"stream-only=${(got -- expected).take(5)} batch-only=${(expected -- got).take(5)}")
    val allowedIds = allowed.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.forall { case (_, _, nid, _) => allowedIds(nid) },
      "a neighbor escaped the label filter")
  }
}
