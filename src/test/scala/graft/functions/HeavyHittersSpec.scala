package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantees checked directly (pure reduce/merge calls)
  * and through the Spark udaf under different partitionings — the
  * merge tree must never break the error bound.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def checkGuarantees(items: Seq[String], summary: Map[String, Long], k: Int): Unit = {
    val ex = exact(items)
    val bound = items.size.toDouble / (k + 1)
    summary.foreach { case (t, c) =>
      assert(c <= ex.getOrElse(t, 0L), s"overestimate for '$t': $c > ${ex.getOrElse(t, 0L)}")
    }
    ex.foreach { case (t, c) =>
      val ap = summary.getOrElse(t, 0L)
      assert(c - ap <= bound, s"undercount for '$t': exact=$c approx=$ap bound=$bound")
    }
  }

  test("sequential reduce keeps the MG bound on a skewed stream") {
    val k = 4
    val agg = new HeavyHittersAgg(k)
    // heavy items a (40%), b (25%); long tail of singletons
    val items = Seq.fill(200)("a") ++ Seq.fill(125)("b") ++
      (0 until 175).map(i => s"t$i")
    val shuffled = new scala.util.Random(7).shuffle(items)
    val summary = shuffled.foldLeft(agg.zero)(agg.reduce)
    assert(summary.size <= k)
    checkGuarantees(shuffled, summary, k)
    assert(summary.contains("a") && summary.contains("b"),
      "items above n/(k+1) frequency must be present")
  }

  test("merge keeps the bound and the size cap under any split") {
    val k = 4
    val agg = new HeavyHittersAgg(k)
    val items = Seq.fill(120)("x") ++ Seq.fill(60)("y") ++
      (0 until 120).map(i => s"z$i")
    val rnd = new scala.util.Random(11)
    for (parts <- Seq(2, 3, 7)) {
      val chunks = rnd.shuffle(items).grouped(items.size / parts + 1).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.reduce(agg.merge)
      assert(merged.size <= k, s"parts=$parts size=${merged.size}")
      checkGuarantees(items, merged, k)
      assert(merged.contains("x"), s"parts=$parts lost the 40% item")
    }
  }

  test("the udaf honors the bound at every partitioning of a real column") {
    import spark.implicits._
    val k = 8
    val hh = udaf(new HeavyHittersAgg(k))
    val items = (Seq.fill(300)("the") ++ Seq.fill(150)("of") ++
      (0 until 300).map(i => s"w$i")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    for (parts <- Seq(1, 4)) {
      val df = items.toDF("id", "tok").repartition(parts)
      val summary = df.agg(hh(col("tok")).as("s"))
        .select(explode(col("s"))).as[(String, Long)].collect().toMap
      assert(summary.size <= k)
      checkGuarantees(items.map(_._2), summary, k)
      assert(summary.contains("the") && summary.contains("of"))
    }
  }

  test("text_heavy_hitters emits scalar rows and obeys the bound at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("text_heavy_hitters")(spark, dir).collect()
    assert(rows.nonEmpty)
    val k = graft.operators.TextQueries.HHCounters
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val byLang = toks.groupBy(_._1)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, langRows) =>
      assert(langRows.length <= k, s"$lang summary exceeds $k counters")
      val summary = langRows.map(r =>
        r.getAs[String]("token") -> r.getAs[Long]("approx_cnt")).toMap
      checkGuarantees(byLang(lang).map(_._2).toSeq, summary, k)
    }
  }
}
