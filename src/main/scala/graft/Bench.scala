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
  *     instead of recording a fast "success".
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

    // Inter-query barrier: drop cached data and force a full GC so one
    // query's shuffle files / heap pressure can't swing the next one's
    // number (r4 verdict: battery interference moved shuffle-heavy
    // queries 2-5x vs isolated runs).
    def barrier(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(50)
    }

    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      barrier()
      val cold = runOnce(name, fn)
      val warms = Seq.fill(3)(runOnce(name, fn)).sorted
      (name, cold, warms(1))
    }
    // Isolated re-run of the 5 slowest: a second number taken behind a
    // fresh barrier, so per-query deltas can be adjudicated against
    // battery interference without chasing ghosts round-over-round.
    val slowest = results.sortBy(-_._3).take(5).map(_._1)
    val isolated = slowest.map { name =>
      barrier()
      runOnce(name, selected(name)) // warmup
      barrier()
      val runs = Seq.fill(3) { barrier(); runOnce(name, selected(name)) }.sorted
      name -> runs(1)
    }
    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"isolated":$iso,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
