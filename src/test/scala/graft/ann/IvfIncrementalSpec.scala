package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental IVF index (assign-only append under a fixed coarse
  * quantizer) must probe IDENTICALLY to a one-shot assignment of the
  * union — assignment is a deterministic function of (vector,
  * centroids), so appending batches can never drift the index — and
  * the probe plan must stay equi-join-shaped (no cartesian anywhere).
  */
class IvfIncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("append-probe equals one-shot probe under the same quantizer") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 10 >= 3)
    val batch = emb.filter(col("vec_id") % 10 < 3)
    val n = emb.count()
    val (nlist, nprobe) = Similarity.autoIvfParams(n)
    val cents = Similarity.ivfCentroids(corpus, nlist)
    val inc = Similarity.ivfAssign(corpus, cents)
      .unionAll(Similarity.ivfAssign(batch, cents))
    val one = Similarity.ivfAssign(emb, cents)
    def probe(idx: DataFrame): Set[(Long, Int, Long, Double)] =
      Similarity.ivfProbe(idx, emb, batch, cents, 5, nprobe, numRows = n)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    val got = probe(inc)
    assert(got.nonEmpty)
    assert(got == probe(one))
  }

  test("probe plan stays equi-join-shaped: no cartesian, no nested loop") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 10 >= 3)
    val batch = emb.filter(col("vec_id") % 10 < 3)
    val (nlist, nprobe) = Similarity.autoIvfParams(emb.count())
    val cents = Similarity.ivfCentroids(corpus, nlist)
    val idx = Similarity.ivfAssign(corpus, cents)
      .unionAll(Similarity.ivfAssign(batch, cents))
    val plan = Similarity.ivfProbe(idx, emb, batch, cents, 5, nprobe,
      numRows = emb.count()).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }
}
