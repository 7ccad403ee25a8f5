package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line.
  *
  * Timing discipline (the honest harness):
  *   - every run materializes the FULL result through the `noop` V2 sink
  *     (all rows, all columns — a pruned `count()` can hide a broken or
  *     lazily-skipped query);
  *   - per query: 1 cold run (JIT/codegen warmup) + 3 warm runs, the
  *     reported number is the warm MEDIAN, so a single GC pause or
  *     subprocess-spawn hiccup can't swing round-over-round comparisons;
  *   - failures propagate — a query that throws fails the bench loudly
  *     instead of recording a fast "success";
  *   - the record is SELF-ADJUDICATING: the battery number of every query
  *     that moved >30% vs the previous round's committed record (latest
  *     `BENCH_r*.json` in the cwd) — plus the 5 slowest overall — is
  *     re-taken in isolation behind fresh barriers, and both numbers are
  *     emitted. A reader can tell battery interference (isolated ≈ prior,
  *     battery inflated) from a true plan regression (isolated moved too)
  *     without re-running anything.
  *
  * Args, if given, are query names: only those run (ad-hoc profiling).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 64 queries x several codegen'd stages far exceeds the default
      // 100-entry generated-class cache; eviction made late-battery
      // re-runs recompile every stage (observed 1.9s -> 7.4s on the
      // same query/plan)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAILURE in query '$name': ${t.getMessage}")
          throw t
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Inter-QUERY barrier: drop cached data and force a full GC so one
    // query's shuffle files / heap pressure can't swing the next one's
    // number (r4 verdict: battery interference moved shuffle-heavy
    // queries 2-5x vs isolated runs).
    def barrier(): Unit = {
      spark.catalog.clearCache()
      // memory-sink tables from the ingest replays (tailrep_*) hold
      // their replayed rows on the driver heap until dropped — 4 runs
      // per bench each leak one
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("tailrep_")).foreach(spark.catalog.dropTempView)
      System.gc()
      Thread.sleep(50)
    }
    // Between one query's OWN warm runs: GC only. Clearing the cache here
    // would defeat a query's internal persist (e.g. dedup_cluster_resolve
    // caches its pair list) and time a plan no real caller runs.
    def gcPause(): Unit = {
      System.gc()
      Thread.sleep(50)
    }

    def isolatedMedian(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      barrier()
      runOnce(name, fn) // warmup behind a fresh barrier
      val runs = Seq.fill(3) { gcPause(); runOnce(name, fn) }.sorted
      runs(1)
    }

    // Previous round's committed record (highest round number in cwd):
    // the comparison base for flagging movers.
    val priorFile = Bench.priorRecord(new java.io.File("."))
    val prior: Map[String, Double] = priorFile.map(Bench.parsePrior).getOrElse(Map.empty)

    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      barrier()
      val cold = runOnce(name, fn)
      val warms = Seq.fill(3) { gcPause(); runOnce(name, fn) }.sorted
      (name, cold, warms(1))
    }

    // Adjudication set: every query whose battery median moved beyond
    // the tiered thresholds (moversOf), plus the 8 slowest overall —
    // the expensive queries are the headline numbers AND the ones
    // battery interference distorts hardest (r9: a 17 s battery median
    // against a 1.7 s isolated re-read), so they always get a clean
    // isolated number printed next to the battery one.
    val movers = Bench.moversOf(results.map { case (n, _, w) => (n, w) }, prior)
    val slowest = results.sortBy(-_._3).take(8).map(_._1)
    val toIsolate = (movers ++ slowest).distinct.sorted
    val isolated = toIsolate.map(name => name -> isolatedMedian(name, selected(name)))

    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val moverList = movers.sorted.map(m => s""""$m"""").mkString("[", ",", "]")
    val priorName = priorFile.map(f => s""""${f.getName}"""").getOrElse("null")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    // warm_total repeated as the LAST field: the driver wrapper keeps only
    // the final 2000 chars of stdout, and the head (where "value" sits)
    // gets truncated once the battery grows — the tail always survives.
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"isolated":$iso,"movers":$moverList,"prior_record":$priorName,"cold_total":$coldTotal,"sf":"$sfDir","warm_total":$warmTotal}""")
    spark.stop()
  }

  /** Latest committed record by PARSED round number — lexicographic
    * sort breaks at r100 (sorts before r99) and on unpadded names.
    */
  def priorRecord(dir: java.io.File): Option[java.io.File] = {
    val pat = "BENCH_r(\\d+)\\.json".r
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName match {
        case pat(n) => Some(n.toInt -> f)
        case _      => None
      })
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Per-query battery medians from a prior record, in any of the three
    * shapes it actually takes on disk:
    *   1. the bench's own JSON line (top-level `"queries"` object);
    *   2. the driver wrapper with a non-null `"parsed"` bench object;
    *   3. the driver wrapper with only a `"tail"` string — the LAST 2000
    *      chars of bench stdout, i.e. the bench line head-truncated
    *      (this is the shape every committed BENCH_r*.json has; round 7
    *      compared against `"queries"` only, so `prior` was always empty
    *      and `"movers":[]` was false reassurance). Here the battery
    *      region (before `"isolated"`) is recovered by regex; the one
    *      query whose name the truncation ate is skipped.
    */
  def parsePrior(f: java.io.File): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    def queryMap(root: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] =
      Option(root.get("queries")).map { qs =>
        qs.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
      }.getOrElse(Map.empty[String, Double])
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val direct = queryMap(root)
      if (direct.nonEmpty) direct
      else {
        val parsed = Option(root.get("parsed")).filterNot(_.isNull)
          .map(queryMap).getOrElse(Map.empty[String, Double])
        if (parsed.nonEmpty) parsed
        else {
          val tail = Option(root.get("tail")).map(_.asText()).getOrElse("")
          val battery = tail.indexOf("\"isolated\"") match {
            case -1 => tail
            case i  => tail.substring(0, i)
          }
          val meta = Set("value", "cold_total", "n", "rc", "cpus", "sf")
          """"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)""".r
            .findAllMatchIn(battery)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filterNot { case (k, _) => meta(k) }
            .toMap
        }
      }
    } catch { case _: Exception => Map.empty[String, Double] }
  }

  /** Queries whose battery median moved vs the prior record: >20% either
    * way for anyone, or >15% for the 10 slowest (by current battery time)
    * — the expensive queries ARE the headline numbers, so smaller drifts
    * there deserve an isolated re-read (r8 verdict: q1_agg drifted +19%
    * across two rounds while sitting under the old 30% threshold).
    */
  def moversOf(results: Seq[(String, Double)], prior: Map[String, Double]): Seq[String] = {
    val top10 = results.sortBy(-_._2).take(10).map(_._1).toSet
    results.collect {
      case (name, w) if prior.get(name).exists { p =>
        val lim = if (top10(name)) 1.15 else 1.2
        p > 0 && (w / p > lim || p / w > lim)
      } => name
    }
  }
}
