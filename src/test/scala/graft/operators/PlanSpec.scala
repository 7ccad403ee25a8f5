package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan shape assertions: these are the properties that make
  * the queries hold at 100 TB — if a refactor silently turns a
  * broadcast join into a sort-merge or un-pushes a scan filter, this
  * suite fails even though results stay correct.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("interval join decomposes to equi-joins on time bins, never a nested loop") {
    val p = plan("ev_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range predicate leaked into the join condition:\n" + p.take(800))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("q5 snowflake: all dimension joins broadcast, none sort-merge") {
    val p = plan("q5_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 5, p.take(400))
    assert(!p.contains("SortMergeJoin"))
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    assert(plan("sort_limit").contains("TakeOrderedAndProject"))
    assert(plan("q3_join_topk").contains("TakeOrderedAndProject"))
  }

  test("q6 pushes every scan predicate into the parquet reader") {
    val p = plan("q6_selective")
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(600))
    assert(p.contains("GreaterThanOrEqual(l_shipda"))
    // pruned read schema: only the referenced columns
    assert(!p.contains("l_orderkey"))
  }

  test("semi/anti joins stay broadcast at dimension scale") {
    assert(plan("join_semi").contains("BroadcastHashJoin"))
    assert(plan("join_anti").contains("BroadcastHashJoin"))
  }

  test("round-14 TPC-H shapes: dims broadcast, single-probe disjunction, no cartesians") {
    // q7: four dimension joins (supp/n1/cust/n2) all broadcast; only
    // the orders join may ride the fact partitioning
    val p7 = plan("q7_nation_volume")
    assert("BroadcastHashJoin".r.findAllIn(p7).size >= 4, p7.take(600))
    // q8: six dimension joins broadcast (part/cust/natC/region/supp/natS)
    val p8 = plan("q8_market_share")
    assert("BroadcastHashJoin".r.findAllIn(p8).size >= 6, p8.take(600))
    assert(!p8.contains("CartesianProduct"))
    // q19: the OR-of-ANDs stays ONE scan + ONE broadcast probe, not
    // three unioned subplans
    val p19 = plan("q19_disjunct_rev")
    assert("BroadcastHashJoin".r.findAllIn(p19).size == 1, p19.take(600))
    assert(!p19.contains("SortMergeJoin") && !p19.contains("Union"))
    // q16: part screen and the complaints anti-join both broadcast
    val p16 = plan("q16_supplier_cnt")
    assert("BroadcastHashJoin".r.findAllIn(p16).size >= 2, p16.take(600))
    assert(!p16.contains("SortMergeJoin"))
    // q17: the correlated-avg join back is broadcast (part-sized)
    val p17 = plan("q17_small_qty")
    assert(!p17.contains("SortMergeJoin"), p17.take(600))
  }

  test("session-4 additions: pair mining, navigation, set-ops, regression plan shapes") {
    // copurchase: equi-join on the order key, never a cartesian
    val pc = plan("agg_copurchase")
    assert(!pc.contains("CartesianProduct") && !pc.contains("BroadcastNestedLoopJoin"), pc.take(400))
    assert(pc.contains("TakeOrderedAndProject"))
    // navigation windows ride ONE orderkey exchange and ONE sort (the
    // window's own)
    val pn = plan("window_navigation")
    assert("Exchange hashpartitioning\\(l_orderkey".r.findAllIn(pn).size == 1, pn.take(600))
    assert("(?m)^\\s*[+:*]*\\s*Sort ".r.findAllIn(pn).size <= 2, pn.take(600))
    // regression/moments: single-scan aggregates, no joins at all
    assert(!plan("agg_regression").contains("Join"))
    assert(!plan("agg_moments").contains("Join"))
    // multiset set ops plan as aggregates + generate, never joins
    val pe = plan("setop_except_all")
    assert(!pe.contains("Join"), pe.take(400))
  }

  test("pattern routing compiles to RLIKE inside the scan filter, no UDFs") {
    val p = plan("ev_route_drop")
    assert(p.contains("RLIKE"))
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"))
  }

  test("runtime bloom-filter injection fires on a selective shuffle join (the 100-TB shuffle reducer)") {
    import org.apache.spark.sql.functions._
    // thresholds sized for the fixture: at real scale the defaults
    // (10 GB application side) gate the same rewrite
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") % 10 === 0)
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      // Catalyst builds a bloom filter over the FILTERED dim's keys and
      // pushes it into the fact scan side — most fact rows die before
      // the shuffle instead of after the join
      assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
        s"no runtime bloom filter in:\n${p.take(1200)}")
      // semantics unchanged: same rows as the unfiltered-plan join
      val expect = {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .count()
      }
      assert(j.count() == expect && expect > 0)
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("minhash aggregation is partial (map-side) before the shuffle") {
    val p = plan("dedup_minhash_lsh")
    // partial_min markers appear in HashAggregate before the exchange
    assert(p.contains("partial_min") || p.contains("partial_"), p.take(400))
  }

  test("windowed replay plans scale: no full-data single-partition stage, keyed or global") {
    // The windows are SIZE-ADAPTIVE (plain single-task plan below
    // graft.window.smallInputRows) — force the segmented path so this
    // pins the shape that runs at scale, on the small fixture
    spark.conf.set("graft.window.smallInputRows", "0")
    try windowedReplayShapes()
    finally spark.conf.unset("graft.window.smallInputRows")
  }

  private def windowedReplayShapes(): Unit = {
    // window-key: name shuffles by (name, rank-bucket) — every
    // window-assignment stage runs on all partitions (the 100-TB
    // shape), and the per-vector assembly keys by (__wk, vec_id)
    val keyed = plan("pipeline_e2e_keyed")
    assert(!keyed.contains("SinglePartition"), keyed.take(800))
    assert(keyed.contains("hashpartitioning(__wk"), keyed.take(800))
    assert(!keyed.contains("hashpartitioning(__k#"), keyed.take(800))
    // the global path's count-only windows are rank arithmetic too
    // (ParallelRank buckets) — since round 12 it no longer funnels the
    // DATA through a constant-key window (`__k = 1`); the only
    // single-partition stage left is the cumulative sum over the TINY
    // per-bucket count table inside the distributed rank
    val global = plan("pipeline_e2e")
    assert(!global.contains("AS __k"), global.take(800))
    assert(global.contains("hashpartitioning(vec_id"), global.take(800))
    val singles = "Exchange SinglePartition".r.findAllIn(global).length
    assert(singles <= 1, s"$singles single-partition exchanges; expected at most the rank-offset cumsum\n${global.take(800)}")
  }

  test("windowed pipelines default to keyed windows (no single-task exchange)") {
    import org.apache.spark.sql.functions._
    // no window-key in the YAML -> the default must be the scalable
    // keyed path: window assignment shuffles by event name, never
    // through one task
    val tpl = graft.spec.Spec.parseYaml(
      """name: dflt
        |steps:
        |  agg:
        |    window:
        |      events: 10
        |    reduce:
        |      deduplicate: null
        |""".stripMargin)
    assert(tpl.windowKey == "name")
    val ev = graft.sources.Tables.events(spark, dir)
    val input = ev.select(col("event_type").as("n"), col("props").as("d"),
      col("event_id").as("__seq"), (col("ts_us") / lit(1e6)).as("arrival"))
    val stamped = graft.pipeline.BatchCompiler.stampInput(tpl, input, col("arrival"))
    val p = graft.pipeline.BatchCompiler.compile(spark, tpl, stamped)
      .output.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p.take(800))
    assert(p.contains("hashpartitioning(__wk"), p.take(800))
  }

  test("no query's optimized plan repeats a per-row json parse (FilterExec has no CSE)") {
    // The r10 trap, twice over: FilterExec performs no subexpression
    // elimination and predicate pushdown re-inlines projected aliases,
    // so N references to a json-parsed alias inline N parses per row
    // (ev_keep_when_str ran 5 parse copies at 2.4 s vs 0.84 s fixed;
    // pipeline_e2e_stress likewise). This sweeps EVERY query's
    // optimized plan so the trap can't silently return with a new
    // query. Live-service/subprocess queries are skipped (they spin
    // endpoints or jq processes at plan build); their output-side
    // parses run on aggregated rows, not per scan row.
    val skip = Set(
      "ev_tail_replay", "ev_http_replay", "ev_spool_replay",
      "ev_amqp_replay", "ev_mqtt_replay", "ev_redis_replay",
      "pipeline_e2e", "pipeline_e2e_compiled", "pipeline_e2e_variant",
      "pipeline_e2e_jsonnet", "pipeline_e2e_keyed", "ev_jq_select_map",
      "pipeline_e2e_reduce", "pipeline_e2e_reduce_compiled",
      "pipeline_e2e_sortby", "pipeline_e2e_sortby_compiled")
    val parseFns = Seq("get_json_object", "from_json", "json_tuple")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, dir)
          .queryExecution.optimizedPlan.toString
        val over = parseFns.map(f => f -> f.r.findAllIn(p).length)
          .filter(_._2 > 2)
        if (over.isEmpty) None else Some(s"$name: ${over.mkString(", ")}")
      }
    assert(offenders.isEmpty,
      s"queries with repeated per-row json parses:\n${offenders.mkString("\n")}")
  }
}
