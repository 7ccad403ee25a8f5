package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavior checks for the curation operators (the DuckDB oracles are
  * the exactness gate; these assert the semantic properties a user
  * relies on, plus the plan shapes that make them scale).
  */
class CurationQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** The production mix residue, replayed via the shared constants so a
    * constant change cannot silently desynchronize these expectations.
    */
  private def mix(id: Long): Long =
    ((id % CurationQueries.MixMod) * CurationQueries.SampleMix) % CurationQueries.MixMod

  test("text_redact_pii: counts match the constructed PII and redaction removes every match") {
    val rows = SparkEntry.queries("text_redact_pii")(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // 1 constructed @mail.example.com + (id % 3) @ex.org copies
      assert(r.getAs[Int]("n_email") == 1 + (id % 3).toInt, s"doc $id emails")
      assert(r.getAs[Int]("n_phone") == 1, s"doc $id phones")
      assert(r.getAs[Int]("n_ip") == 1, s"doc $id ips")
      val red = r.getAs[String]("redacted")
      assert(!red.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"), s"doc $id email left")
      assert(!red.contains("+1-555-"), s"doc $id phone left")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    }
  }

  test("text_repetition: fractions bounded, and the repetitive corpus scores > 0") {
    val rows = SparkEntry.queries("text_repetition")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("dup_word_frac", "top_word_frac", "dup_2gram_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      // the most frequent word accounts for at least a 1/n share
      assert(r.getAs[Double]("top_word_frac") >= 1.0 / r.getAs[Long]("n_tokens"))
    }
    assert(rows.exists(_.getAs[Double]("dup_word_frac") > 0.0))
  }

  test("text_contamination: candidates only, ratio consistent, overlap exists on the shared vocab") {
    val rows = SparkEntry.queries("text_contamination")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") >= 200)
      val hit = r.getAs[Long]("n_hit")
      val total = r.getAs[Long]("n_grams")
      assert(hit >= 0 && hit <= total)
      assert(math.abs(r.getAs[Double]("contamination") - hit.toDouble / total) < 1e-12)
    }
    assert(rows.exists(_.getAs[Long]("n_hit") > 0), "tiny vocabulary must collide")
  }

  test("text_contamination: benchmark gram side is broadcast, not shuffled") {
    val p = SparkEntry.queries("text_contamination")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("sample_stratified: exactly the deterministic per-stratum residue rule") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val kept = SparkEntry.queries("sample_stratified")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val expect = docs.collect {
      case (id, lang) if mix(id) % 10 <
        (if (lang == "en") CurationQueries.EnTenths else CurationQueries.OtherTenths) => id
    }.toSet
    assert(kept == expect)
    // the narrow-filter shape: no shuffle besides the presentation sort
    val p = SparkEntry.queries("sample_stratified")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"))
  }

  test("sample_weighted: exactly the PPS inclusion rule; long docs over-sampled") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ctot = rows.map(_._2).sum
    val b = CurationQueries.WeightedBudget
    def thr(nc: Long): Long = math.min(1000000L, b * 1000000L * nc / ctot)
    val expect = rows.collect {
      case (id, nc) if mix(id) % 1000000 < thr(nc) => id
    }.toSet
    val kept = SparkEntry.queries("sample_weighted")(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == expect && kept.nonEmpty && kept.size < rows.length)
    // PPS property: the kept set's mean length exceeds the corpus mean
    val keptMean = rows.filter(r => kept(r._1)).map(_._2).sum.toDouble / kept.size
    assert(keptMean > ctot.toDouble / rows.length,
      s"PPS should over-sample long docs: kept mean $keptMean vs corpus ${ctot.toDouble / rows.length}")
  }

  test("sample_fixed_n: exactly N docs, the mix-order prefix, via TakeOrdered not a global sort") {
    import org.apache.spark.sql.functions._
    val ids = graft.sources.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))
    val expect = ids.sortBy(id => (mix(id), id)).take(100).toSet
    val q = SparkEntry.queries("sample_fixed_n")(spark, dir)
    val got = q.collect().map(_.getAs[Long]("doc_id"))
    assert(got.length == 100 && got.toSet == expect)
    assert(got.sorted.sameElements(got), "presentation order is doc_id")
    // scale shape: the limit plans as TakeOrdered (per-partition heaps
    // merged on the driver), never a whole-table Sort+Exchange
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), s"expected TakeOrderedAndProject in:\n$p")
  }

  test("sample_quota: exactly K per stratum, ranked by the portable mix order") {
    val strata = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    val rows = SparkEntry.queries("sample_quota")(spark, dir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == strata.keySet, "every stratum is represented")
    byLang.foreach { case (lang, rs) =>
      val expectK = math.min(CurationQueries.QuotaK, strata(lang).length)
      assert(rs.length == expectK, s"$lang quota")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to expectK), s"$lang ranks")
      // membership = the true top-K of the mix order (salting is plan-internal)
      val expect = strata(lang).map(_._1)
        .sortBy(id => (mix(id), id))
        .take(expectK).toSet
      assert(rs.map(_.getAs[Long]("doc_id")).toSet == expect, s"$lang membership")
    }
  }

  test("sample_mixture_repeat: copy counts follow the per-source tenths weights") {
    val rows = SparkEntry.queries("sample_mixture_repeat")(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val n = rs.head.getAs[Int]("n_copies")
      assert(rs.length == n && rs.map(_.getAs[Int]("copy")).sorted.toSeq == (1 to n))
      val src = rs.head.getAs[String]("source")
      val w10 = if (Set("src0", "src1", "src2", "src3", "src4")(src)) 30
      else if (Set("src5", "src6", "src7", "src8", "src9")(src)) 15 else 10
      val expect = w10 / 10 +
        (if (mix(id) % 10 < w10 % 10) 1 else 0)
      assert(n == expect, s"doc $id copies")
    }
    assert(rows.exists(_.getAs[Int]("copy") > 1), "upsampled shards must repeat")
  }

  test("sample_token_budget: hash-order prefix per shard, overshoot < one doc") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        (id, r.getAs[String]("source"),
          r.getAs[String]("text").trim.split("\\s+").count(_.nonEmpty))
      }
    val rows = SparkEntry.queries("sample_token_budget")(spark, dir).collect()
    val kept = rows.map(_.getAs[Long]("doc_id")).toSet
    docs.groupBy(_._2).foreach { case (src, ds) =>
      // replay the draw: hash order, keep while the doc STARTS under budget
      val inOrder = ds.sortBy { case (id, _, _) => (mix(id), id) }
      var cum = 0L
      val expect = inOrder.takeWhile { case (_, _, n) =>
        val starts = cum; cum += n; starts < CurationQueries.TokenBudget
      }.map(_._1).toSet
      assert(rows.filter(_.getAs[String]("source") == src)
        .map(_.getAs[Long]("doc_id")).toSet == expect, s"$src membership")
      // the kept prefix covers the budget unless the shard ran out
      val keptToks = inOrder.filter(d => kept(d._1)).map(_._3.toLong).sum
      assert(keptToks >= math.min(CurationQueries.TokenBudget.toLong,
        inOrder.map(_._3.toLong).sum), s"$src undershoot")
    }
    assert(kept.size < docs.length, "the budget must actually cut")
  }

  test("scans are pruned to the referenced columns (the 100-TB read-cost property)") {
    def read(q: String): String =
      "ReadSchema: [^\n]*".r.findAllIn(
        SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString)
        .mkString("; ")
    assert(read("text_redact_pii").contains("struct<doc_id:bigint,text:string>"))
    assert(read("sample_stratified").contains("struct<doc_id:bigint,lang:string,source:string>"))
    assert(read("sample_quota").contains("struct<doc_id:bigint,lang:string>"))
    assert(read("sample_mixture_repeat").contains("struct<doc_id:bigint,source:string>"))
    assert(read("pack_sequences").contains("struct<doc_id:bigint,text:string,source:string>"))
    assert(read("emb_quantize_int8").contains("struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("text_chunk_overlap: full coverage, 48-token stride, 64-token windows") {
    val docToks = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").trim.split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty).toMap
    val rows = SparkEntry.queries("text_chunk_overlap")(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val toks = docToks(id)
      val byChunk = rs.sortBy(_.getAs[Long]("chunk_id"))
      byChunk.zipWithIndex.foreach { case (r, i) =>
        val start = r.getAs[Int]("start_tok")
        assert(r.getAs[Long]("chunk_id") == i && start == i * 48, s"doc $id chunk $i")
        val expect = toks.slice(start, start + 64)
        assert(r.getAs[Int]("n_chunk_toks") == expect.length)
        assert(r.getAs[String]("chunk_text") == expect.mkString(" "))
      }
      // every token index is inside at least one chunk window
      val covered = byChunk.flatMap { r =>
        val s = r.getAs[Int]("start_tok"); s until (s + r.getAs[Int]("n_chunk_toks"))
      }.toSet
      assert(covered == toks.indices.toSet, s"doc $id coverage")
    }
    assert(rows.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1),
      "multi-chunk docs must exist")
  }

  test("pack_sequences: per-source running offsets, pack = chunk of the first token") {
    val rows = SparkEntry.queries("pack_sequences")(spark, dir).collect()
    assert(rows.length == 500)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("tok_offset") == cum, s"offset mismatch at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("pack_id") == cum / 256)
        cum += r.getAs[Int]("n_toks")
      }
    }
    // multi-doc packs exist (budget 256 vs ~50-token docs)
    assert(rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("pack_id")))
      .exists(_._2.length > 1))
  }

  test("sample_split: 98/1/1 slots, membership is a pure function of doc_id") {
    val rows = SparkEntry.queries("sample_split")(spark, dir).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "validation", "test"))
    assert(bySplit("train") > bySplit("validation") + bySplit("test"))
    // pure function of doc_id: the assignment formula evaluated on the
    // id alone reproduces every row — no dependence on other rows, so
    // growing or re-partitioning the corpus can never move a doc
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // the SHIPPED constants, not pinned copies
      val slot = ((id % CurationQueries.MixMod) * CurationQueries.SampleMix %
        CurationQueries.MixMod) % 100L
      val want =
        if (slot < CurationQueries.SplitTrainPct) "train"
        else if (slot < CurationQueries.SplitTrainPct + CurationQueries.SplitValPct) "validation"
        else "test"
      assert(r.getAs[String]("split") == want, s"doc $id")
    }
  }

  test("sample_temperature: low-resource languages keep a larger share than raw proportion") {
    val langN = graft.sources.Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val drawn = SparkEntry.queries("sample_temperature")(spark, dir).collect()
      .groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    assert(drawn.values.sum > 0)
    // acceptance RATE (drawn/n) must be weakly larger for smaller
    // languages — that is the whole point of temperature flattening
    val rates = langN.map { case (l, n) => l -> (drawn.getOrElse(l, 0L).toDouble / n, n) }
    val bySize = rates.toSeq.sortBy(_._2._2)
    bySize.sliding(2).foreach {
      case Seq((l1, (r1, n1)), (l2, (r2, n2))) if n1 < n2 =>
        assert(r1 >= r2 * 0.8, // slack for hash-residue granularity
          s"$l1 (n=$n1, rate=$r1) should out-rate $l2 (n=$n2, rate=$r2)")
      case _ =>
    }
  }
}
