package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Count-min sketch contracts: the JVM/Column/SQL cell functions are
  * one hash, the sketch is an exact mergeable index (union-of-splits
  * == one-shot, row-for-row), and estimates never undercount.
  */
class CmsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def toks = {
    import graft.functions.TextFunctions
    graft.sources.Tables.documents(spark, dir)
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
  }

  test("cellOf (JVM) equals the Column cell for every (depth, token) in the corpus") {
    import spark.implicits._
    val cols = toks.distinct()
      .select(col("tok"), explode(sequence(lit(0), lit(CmsOps.Depth - 1))).as("d"))
      .withColumn("cell", CmsOps.cell(col("d"), col("tok")))
      .as[(String, Int, Long)].collect()
    assert(cols.nonEmpty)
    cols.foreach { case (t, d, c) =>
      assert(CmsOps.cellOf(d, t).toLong == c, s"cell mismatch for d=$d tok=$t")
    }
  }

  test("merge of split sketches equals the one-shot sketch row-for-row") {
    // deterministic 2-way split by token value: odd/even depth-0 cell
    val a = toks.filter(CmsOps.cell(lit(0), col("tok")) % 2 === 0)
    val b = toks.filter(CmsOps.cell(lit(0), col("tok")) % 2 =!= 0)
    val merged = CmsOps.mergeCms(CmsOps.buildCms(a, col("tok")),
        CmsOps.buildCms(b, col("tok")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = CmsOps.buildCms(toks, col("tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot && oneShot.nonEmpty)
  }

  test("text_cms_join_size: the sketch inner product upper-bounds the true join size") {
    val r = SparkEntry.queries("text_cms_join_size")(spark, dir).collect()
    assert(r.length == 1)
    val (tru, est, over) = (r.head.getAs[Long]("true_size"),
      r.head.getAs[Long]("est_size"), r.head.getAs[Long]("overcount"))
    assert(tru > 0L)
    assert(est >= tru, s"inner product undercounted: est=$est true=$tru")
    assert(over == est - tru)
  }

  test("text_drift_tvd: distances in [0,1), numerators recompute client-side") {
    val rows = SparkEntry.queries("text_drift_tvd")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tvd = r.getAs[Double]("tvd")
      assert(tvd >= 0.0 && tvd < 1.0, s"TVD out of range: $r")
      // tvd == num / (2 * (n_new+v) * (n_corp+v)) exactly
      val dNew = r.getAs[Long]("n_new") + r.getAs[Long]("v")
      val dCorp = r.getAs[Long]("n_corp") + r.getAs[Long]("v")
      assert(tvd == r.getAs[Long]("tvd_num").toDouble / (2.0 * dNew * dCorp))
    }
    // identical distributions (a split that puts the same multiset on
    // both sides) would give num driven only by smoothing: sanity that
    // the real split actually drifts somewhere
    assert(rows.exists(_.getAs[Long]("tvd_num") > 0L))
  }

  test("text_cms_counts: estimates never undercount, and some token is estimated exactly") {
    val rows = SparkEntry.queries("text_cms_counts")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L, s"CMS undercounted: $r")
      assert(r.getAs[Long]("est_cnt") ==
        r.getAs[Long]("true_cnt") + r.getAs[Long]("overcount"))
    }
    assert(rows.exists(_.getAs[Long]("overcount") == 0L))
    // total stream length bounds any single estimate
    val n = rows.map(_.getAs[Long]("true_cnt")).sum
    rows.foreach(r => assert(r.getAs[Long]("est_cnt") <= n))
  }
}
