package graft.ann

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the dimensionality-reduction step of
  * an embedding-store pipeline (cheaper ANN shortlists, whitening,
  * drift monitors), built the way 100 TB demands:
  *
  *  1. ONE distributed pass accumulates the second-moment matrix in
  *     FIXED-POINT: each row quantizes x_i and x_i·x_j to 1e-9 units
  *     and the [[MomentAgg]] Aggregator sums BIGINTs — integer sums
  *     are bit-identical under any partitioning/merge order, so the
  *     fitted basis is deterministic run to run (a raw double sum
  *     would wobble in the last ulps and flip near-tied eigenvectors).
  *     The exchange carries ONE buffer of dim·(dim+3)/2+1 longs per
  *     partition — constant in n, like the other sketch aggregates.
  *  2. The driver eigendecomposes the dim×dim covariance (cyclic
  *     Jacobi — deterministic sweep order, no RNG) and keeps the top
  *     k eigenvectors, sign-fixed so each basis vector's
  *     largest-magnitude component is positive.
  *  3. Projection is k native dot products against basis literals —
  *     map-side, codegen'd, no shuffle.
  *
  * Rows-only by design (an eigenbasis is not SQL-mirrorable); Verify
  * asserts the machine-checkable contract instead: orthonormal basis,
  * eigenvalues descending, and per-component projected variance
  * matching its eigenvalue.
  */
object Pca {

  /** Fixed-point scale for the moment sums: 1e-9 units keep
    * |x| ≤ ~100, n ≤ ~1e9 rows inside BIGINT range for unit-norm-ish
    * embedding components.
    */
  val MomentFp = 1e9

  /** Accumulates [count, Σx_i (dim), Σx_i·x_j upper-tri] as
    * fixed-point longs over `array<float>` rows.
    */
  class MomentAgg(dim: Int) extends Aggregator[Seq[Float], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](1 + dim + tri)
    override def reduce(b: Array[Long], x: Seq[Float]): Array[Long] = {
      b(0) += 1L
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        val xi = x(i).toDouble
        b(1 + i) += math.floor(xi * MomentFp + 0.5).toLong
        var j = i
        while (j < dim) {
          b(t) += math.floor(xi * x(j).toDouble * MomentFp + 0.5).toLong
          t += 1
          j += 1
        }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed sweep order, convergence by off-diagonal
    * norm). Returns (eigenvalues, eigenvectors as rows), unsorted.
    */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm() > 1e-22) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(n)(i => a(i)(i))
    val vectors = Array.tabulate(n)(j => Array.tabulate(n)(i => v(i)(j))) // column j -> row
    (eig, vectors)
  }

  /** Fit the top-`k` principal basis of an embedding column. Returns
    * (eigenvalues desc, basis rows), both deterministic.
    */
  def fitBasis(vectors: DataFrame, k: Int, dim: Int,
               vecCol: String = "embedding"): (Seq[Double], Seq[Seq[Double]]) = {
    val (eig, basis, _) = fitBasisWithTrace(vectors, k, dim, vecCol)
    (eig, basis)
  }

  /** [[fitBasis]] plus the covariance TRACE (= total variance = Σ of
    * ALL dim eigenvalues) from the same single moment pass — so a
    * caller can report the cumulative explained-variance ratio
    * Σtop-k eig / trace without a second pass, and choose k against an
    * explicit coverage contract rather than blind.
    */
  def fitBasisWithTrace(vectors: DataFrame, k: Int, dim: Int,
               vecCol: String = "embedding"): (Seq[Double], Seq[Seq[Double]], Double) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val agg = udaf(new MomentAgg(dim))
    val b = vectors.select(agg(col(vecCol)).as("m")).as[Array[Long]].head()
    val n = b(0).toDouble
    require(n > 1, s"need at least 2 vectors to fit a basis, got $n")
    val mean = Array.tabulate(dim)(i => b(1 + i) / MomentFp / n)
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val m2 = b(t) / MomentFp / n
        val c = m2 - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    // trace from the covariance diagonal: invariant under the Jacobi
    // rotations, so it equals Σ of all eigenvalues exactly
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val (eig, vecs) = jacobiEigen(cov)
    val order = eig.indices.sortBy(ix => (-eig(ix), ix)).take(k)
    val basis = order.map { ix =>
      val v = vecs(ix)
      // deterministic orientation: largest-|component| positive
      val piv = v.indices.maxBy(c => (math.abs(v(c)), -c))
      if (v(piv) < 0) v.map(-_).toSeq else v.toSeq
    }
    (order.map(eig), basis, trace)
  }

  /** Project onto a fitted basis: k codegen'd dot products against
    * literal rows; output one scalar row per (id, component).
    */
  def project(vectors: DataFrame, basis: Seq[Seq[Double]],
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val comps = array(basis.zipWithIndex.map { case (bv, j) =>
      struct(lit(j).as("pc"),
        graft.functions.VectorExpressions.dot(col(vecCol), array(bv.map(lit): _*)).as("value"))
    }: _*)
    vectors.select(col(idCol), explode(comps).as("p"))
      .select(col(idCol), col("p.pc").as("pc"), col("p.value").as("value"))
  }
}
