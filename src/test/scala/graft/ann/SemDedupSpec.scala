package graft.ann

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SemDedupKey
import graft.operators.AnnQueries
import graft.sources.Tables

/** SemDedup verdicts vs an independent in-memory reference: the spec
  * re-implements the kernel arithmetic (norm, 1e6 fixed point, sign
  * buckets) and the pairwise-dominance rule in plain Scala over
  * collected rows, then demands the distributed result match id-for-id
  * on (bucket, cscore, kept). Plus a handcrafted corpus with a planted
  * duplicate pair to pin the diversity-preserving representative rule.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** Single-threaded reference: same float→double, same left-assoc
    * norm accumulation, same floor rounding, same sign table, integer
    * dots — so agreement is exact, not approximate.
    */
  private def reference(rows: Seq[(Long, Array[Float])], dim: Int, bits: Int,
                        tauFp: Long): Map[Long, (Int, Long, Boolean)] = {
    val keyed = rows.map { case (id, v) =>
      var ss = 0.0
      var i = 0
      while (i < dim) { val x = v(i).toDouble; ss += x * x; i += 1 }
      val nr = math.sqrt(ss)
      val u = Array.tabulate(dim)(k =>
        if (nr == 0.0) 0L else math.floor(v(k).toDouble / nr * 1e6 + 0.5).toLong)
      var bucket = 0
      var j = 0
      while (j < bits) {
        var s = 0L
        var k = 0
        while (k < dim) { s += SemDedupKey.sign(j, k, dim) * u(k); k += 1 }
        if (s >= 0L) bucket |= (1 << j)
        j += 1
      }
      (id, u, bucket)
    }
    val cent: Map[Int, Array[Long]] = keyed.groupBy(_._3).map { case (b, ms) =>
      b -> Array.tabulate(dim)(i => ms.map(_._2(i)).sum)
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      (0 until dim).map(i => a(i) * b(i)).sum
    val scored = keyed.map { case (id, u, b) => (id, u, b, dot(u, cent(b))) }
    scored.map { case (id, u, b, sc) =>
      val isDropped = scored.exists { case (id2, u2, b2, sc2) =>
        id2 != id && b2 == b && dot(u, u2) >= tauFp &&
          (sc2 < sc || (sc2 == sc && id2 < id))
      }
      id -> ((b, sc, !isDropped))
    }.toMap
  }

  private def run(rows: Seq[(Long, Array[Float])], dim: Int, bits: Int,
                  tauFp: Long): Map[Long, (Int, Long, Boolean)] = {
    import spark.implicits._
    val df = rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    SemDedup.dedupSemantic(df, dim, bits, tauFp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("planted duplicate pair: lower-centroid-similarity member survives") {
    val dim = 8
    // Two near-identical vectors (a planted duplicate pair) plus
    // spread-out singletons. The pair lands in one bucket; exactly one
    // of the two is dropped, and it is the one with the HIGHER
    // centroid similarity (the farthest-from-centroid member is the
    // paper's diversity-preserving representative).
    val base = Array(0.9f, 0.1f, -0.3f, 0.7f, 0.2f, -0.8f, 0.4f, 0.05f)
    val near = base.clone(); near(1) += 0.01f
    val rows: Seq[(Long, Array[Float])] = Seq(
      1L -> base, 2L -> near,
      3L -> Array(-0.9f, 0.8f, 0.1f, -0.2f, 0.6f, 0.3f, -0.7f, 0.1f),
      4L -> Array(0.1f, -0.9f, 0.8f, 0.1f, -0.5f, 0.2f, 0.3f, -0.6f),
      5L -> Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 1.0f))
    val tauFp = 950000000000L // cos >= 0.95 in the 1e12 dot scale
    val got = run(rows, dim, bits = 3, tauFp = tauFp)
    val want = reference(rows, dim, bits = 3, tauFp = tauFp)
    assert(got == want)
    // the planted pair shares a bucket and loses exactly one member
    assert(got(1L)._1 == got(2L)._1)
    assert(got(1L)._3 != got(2L)._3)
    val (kept, dropped) = if (got(1L)._3) (1L, 2L) else (2L, 1L)
    assert(got(kept)._2 <= got(dropped)._2,
      "representative must be the member with lower centroid similarity")
    // singletons and the zero vector always survive
    assert(Seq(3L, 4L, 5L).forall(got(_)._3))
  }

  test("plan shape pins the scale fixes: LongDot kernel in the pair stage, kernel behind an exchange") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = SemDedup.dedupSemantic(emb, AnnQueries.EmbDim, AnnQueries.SemBits,
        AnnQueries.SemTauFp)
      .queryExecution.executedPlan.toString
    // the pair predicate must run the codegen'd integer-dot kernel —
    // a 2·dim GetArrayItem chain silently drops to interpreted eval
    assert(plan.contains("longdot"),
      s"pair dots left the LongDot kernel, plan:\n${plan.take(800)}")
    // the kernel output must be materialized through the bucket
    // exchange — bare lineage lets projection collapse re-derive the
    // whole kernel per element access (312x at 100x data)
    assert("hashpartitioning\\(bucket".r.findAllIn(plan).nonEmpty,
      s"keyed projection lost its bucket exchange, plan:\n${plan.take(800)}")
  }

  test("sf0.001 embeddings: distributed verdicts match the reference id-for-id") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows: Seq[(Long, Array[Float])] = emb.collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray
    }.toSeq
    val got = run(rows, AnnQueries.EmbDim, AnnQueries.SemBits, AnnQueries.SemTauFp)
    val want = reference(rows, AnnQueries.EmbDim, AnnQueries.SemBits, AnnQueries.SemTauFp)
    assert(got.size == rows.size)
    assert(got == want)
    // the corpus must actually exercise both outcomes at this tau
    assert(got.values.exists(_._3) && got.values.exists(!_._3),
      "tau produced a degenerate all-kept or all-dropped verdict set")
  }
}
