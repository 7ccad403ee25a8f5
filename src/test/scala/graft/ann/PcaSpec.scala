package graft.ann

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("jacobiEigen solves a known symmetric matrix") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1, vectors (1,1)/√2 and (1,-1)/√2
    val (eig, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = eig.indices.sortBy(i => -eig(i))
    assert(math.abs(eig(order(0)) - 3.0) < 1e-12)
    assert(math.abs(eig(order(1)) - 1.0) < 1e-12)
    val top = vecs(order(0))
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12) // (1,1) direction
  }

  test("fitBasis: orthonormal, eigenvalues descending, deterministic across fits and partitionings") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val (eig, basis) = Pca.fitBasis(emb, 8, 64)
    assert(basis.length == 8 && basis.forall(_.length == 64))
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b })
    for (i <- basis.indices; j <- i until basis.length) {
      val d = basis(i).zip(basis(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"<$i,$j> = $d")
    }
    // fixed-point moment sums -> bit-identical basis at any partitioning
    val (eig2, basis2) = Pca.fitBasis(emb.repartition(7), 8, 64)
    assert(eig == eig2 && basis == basis2)
  }

  test("trace = total variance: full-k eigenvalues sum to it; explained ratio is monotone in k") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val (allEig, _, trace) = Pca.fitBasisWithTrace(emb, 64, 64)
    assert(trace > 0)
    // Jacobi preserves the trace, so Σ of ALL eigenvalues = trace
    assert(math.abs(allEig.sum - trace) / trace < 1e-9, s"sum=${allEig.sum} trace=$trace")
    val (topEig, _, trace2) = Pca.fitBasisWithTrace(emb, 8, 64)
    assert(trace2 == trace) // same moment pass, same covariance
    val ratio = topEig.sum / trace
    assert(ratio > 8.0 / 64 && ratio <= 1.0, s"explained ratio $ratio")
  }

  test("projection variance matches the eigenvalues; first component dominates") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val (eig, basis) = Pca.fitBasis(emb, 4, 64)
    val vars = Pca.project(emb, basis)
      .groupBy("pc").agg(var_pop(col("value")).as("v"))
      .collect().map(r => r.getAs[Int]("pc") -> r.getAs[Double]("v")).toMap
    eig.indices.foreach { j =>
      assert(math.abs(vars(j) - eig(j)) <= 0.05 * math.max(eig.head, 1e-12),
        s"pc $j: var=${vars(j)} eig=${eig(j)}")
    }
    assert(vars(0) >= vars(1) * 0.99)
  }

  test("emb_pca_project emits one scalar row per (vector, component)") {
    val rows = graft.SparkEntry.queries("emb_pca_project")(spark, dir).collect()
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.length == n * graft.operators.AnnQueries.PcaK)
    assert(rows.forall(r => r.schema.fieldNames.toSeq == Seq("vec_id", "pc", "value")))
  }
}
