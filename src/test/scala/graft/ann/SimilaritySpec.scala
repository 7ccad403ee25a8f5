package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("cosine of a vector with itself is 1.0 exactly for unit-safe folds") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val c = df.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("brute-force top-k: k rows per query, ranked by descending cosine") {
    val emb = Tables.embeddings(spark, dir)
    val res = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 5)
      .collect()
    assert(res.length == 25)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("multi-table LSH reaches usable recall vs brute force (sf0.001)") {
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteForceTopK(emb, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, 5, bits = 6, dim = 64, tables = 16)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.4, s"LSH recall too low: $recall")
    // and the LSH path must never invent pairs with better cosine than
    // brute force's floor for that query — structural sanity
    assert(lsh.forall { case (q, n) => q != n })
  }
}
