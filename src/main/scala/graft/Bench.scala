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

    // Previous round's committed record (latest BENCH_r*.json in cwd):
    // the comparison base for flagging movers.
    val priorFile: Option[java.io.File] = Option(new java.io.File(".").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(_.getName)
      .lastOption
    val prior: Map[String, Double] = priorFile.map { f =>
      try {
        import scala.jdk.CollectionConverters._
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        Option(root.get("queries")).map { qs =>
          qs.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
        }.getOrElse(Map.empty[String, Double])
      } catch { case _: Exception => Map.empty[String, Double] }
    }.getOrElse(Map.empty)

    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      barrier()
      val cold = runOnce(name, fn)
      val warms = Seq.fill(3) { gcPause(); runOnce(name, fn) }.sorted
      (name, cold, warms(1))
    }

    // Adjudication set: every query whose battery median moved >30% in
    // either direction vs the prior record, plus the 5 slowest overall.
    val movers = results.collect {
      case (name, _, w) if prior.get(name).exists { p =>
        p > 0 && (w / p > 1.3 || p / w > 1.3)
      } => name
    }
    val slowest = results.sortBy(-_._3).take(5).map(_._1)
    val toIsolate = (movers ++ slowest).distinct.sorted
    val isolated = toIsolate.map(name => name -> isolatedMedian(name, selected(name)))

    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val moverList = movers.sorted.map(m => s""""$m"""").mkString("[", ",", "]")
    val priorName = priorFile.map(f => s""""${f.getName}"""").getOrElse("null")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"isolated":$iso,"movers":$moverList,"prior_record":$priorName,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
