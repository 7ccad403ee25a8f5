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
  *     that moved beyond the tiered thresholds (`moversOf`) vs the
  *     previous round's committed record (latest `BENCH_r*.json` in the
  *     cwd) — plus the 8 slowest overall — is
  *     re-taken in a FRESH FORKED JVM (`--isolated` child mode, parent
  *     session stopped first), and both numbers are emitted. A reader can
  *     tell battery interference (isolated ≈ prior, battery inflated)
  *     from a true plan regression (isolated moved too) without
  *     re-running anything — and the isolated column cannot itself be
  *     polluted by cumulative battery-JVM state (r9 saw a 17 s battery
  *     median against a 1.7 s clean number for the same plan).
  *
  * Args, if given, are query names: only those run (ad-hoc profiling).
  * `--isolated <name>` is the internal child mode: one query, own
  * SparkSession, prints one `GRAFT_ISOLATED {...}` line.
  */
object Bench {
  private def newSession(): SparkSession = {
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
    spark
  }

  private def runQuery(spark: SparkSession, sfDir: String, name: String): Double = {
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch {
      case t: Throwable =>
        System.err.println(s"BENCH FAILURE in query '$name': ${t.getMessage}")
        throw t
    }
    (System.nanoTime() - t0) / 1e9
  }

  /** Child mode: one query in a JVM that has run nothing else. The cold
    * run is this JVM's JIT/codegen warmup; the printed number is the
    * median of 3 warm runs — the same discipline as the battery, minus
    * every possibility of cross-query pollution.
    */
  private def isolatedChild(name: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = newSession()
    runQuery(spark, sfDir, name)
    val runs = Seq.fill(3) {
      System.gc(); Thread.sleep(50)
      runQuery(spark, sfDir, name)
    }.sorted
    println(s"""GRAFT_ISOLATED {"query":"$name","median":${runs(1)}}""")
    spark.stop()
  }

  /** Fork a fresh JVM for one isolated re-run: same JVM args as this
    * process (the sbt fork already carries the JDK-17 add-opens and
    * -Xmx), same classpath, inherited env. Returns None when forking
    * isn't possible (launcher-only classpath) or the child fails.
    */
  private def forkIsolated(name: String): Option[Double] = {
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths.get(
        sys.props("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench", "--isolated", name)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      // stdout to EOF first (stderr is inherited, so no pipe deadlock)
      val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      val rc = p.waitFor()
      val pat = """GRAFT_ISOLATED \{"query":"[^"]+","median":([0-9.Ee+-]+)\}""".r.unanchored
      if (rc == 0) out.collectFirst { case pat(m) => m.toDouble } else None
    } catch { case _: Exception => None }
  }

  /** Fixed 5-probe CONTAINER CALIBRATION, run before the battery and
    * committed with every record: five primitives whose PLANS never
    * change round over round, one per path environmental drift moves —
    * parquet scan, shuffle aggregate, sort/window, raw codegen CPU,
    * and subprocess spawn (the jq-pipeline pump cost). Cross-round
    * comparisons divide by the calibration ratio first, so a container
    * swap (r16's +22.8% flat-total shift) reads as "calibration moved
    * ×1.2, queries moved with it — no plan regression" instead of a
    * per-query reconciliation essay. Same cold + 3-warm-median
    * discipline as the battery.
    */
  private def calibration(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    val probes: Seq[(String, () => Unit)] = Seq(
      "calib_scan" -> (() => spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.format("noop").mode("overwrite").save()),
      "calib_shuffle" -> (() => spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_orderkey").count()
        .write.format("noop").mode("overwrite").save()),
      "calib_window" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy("l_partkey")
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .withColumn("rn", row_number().over(w))
          .write.format("noop").mode("overwrite").save()
      }),
      "calib_cpu" -> (() => spark.range(0L, 20000000L, 1L, 32)
        .select(expr("bit_xor(xxhash64(id))")) // xor: no ANSI overflow
        .write.format("noop").mode("overwrite").save()),
      "calib_spawn" -> (() => (1 to 24).foreach { _ =>
        new ProcessBuilder("/usr/bin/env", "true").start().waitFor()
      }),
      // the r19 adjudication's blind spot: the events scan + per-user
      // timestamp window class (ev_*, sessionize-shaped q*) drifted
      // ×1.4-1.6 on BOTH r18 and r19 code while the five probes above
      // read flat — this probe times exactly that shape so r20+ can
      // divide the class's drift out instead of re-running worktree
      // A/Bs. Added r19; calibrationScale only ratios SHARED probes,
      // so records before r19 stay comparable.
      "calib_eventswindow" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts_us")
        graft.sources.Tables.events(spark, sfDir)
          .withColumn("gap", col("ts_us") - lag("ts_us", 1).over(w))
          .write.format("noop").mode("overwrite").save()
      }))
    probes.map { case (name, f) =>
      f() // cold: JIT/codegen warmup
      val runs = Seq.fill(3) {
        System.gc(); Thread.sleep(20)
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> runs(1)
    }
  }

  /** Median current/prior ratio over the shared calibration probes —
    * the container-drift factor cross-round comparisons divide out.
    * 1.0 when the prior record predates the calibration block.
    */
  def calibrationScale(cur: Seq[(String, Double)],
                       prior: Map[String, Double]): Double = {
    val ratios = cur.collect {
      case (n, v) if prior.get(n).exists(_ > 0) => v / prior(n)
    }.sorted
    if (ratios.isEmpty) 1.0 else ratios(ratios.size / 2)
  }

  def main(args: Array[String]): Unit = {
    args.toList match {
      case "--isolated" :: name :: Nil => isolatedChild(name); return
      case _                           => ()
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = newSession()

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

    // Previous round's committed record (highest round number in cwd):
    // the comparison base for flagging movers.
    val priorFile = Bench.priorRecord(new java.io.File("."))
    val prior: Map[String, Double] = priorFile.map(Bench.parsePrior).getOrElse(Map.empty)
    val priorCalib: Map[String, Double] =
      priorFile.map(Bench.parsePriorCalibration).getOrElse(Map.empty)

    // container calibration first — a clean JVM, nothing cached yet
    val calib = calibration(spark, sfDir)
    val calibScale = Bench.calibrationScale(calib, priorCalib)

    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.keys.toSeq.sorted.map { name =>
      barrier()
      val cold = runQuery(spark, sfDir, name)
      val warms = Seq.fill(3) { gcPause(); runQuery(spark, sfDir, name) }.sorted
      (name, cold, warms(1))
    }

    // Adjudication set: every query whose battery median moved beyond
    // the tiered thresholds (moversOf), plus the 8 slowest overall —
    // the expensive queries are the headline numbers AND the ones
    // battery interference distorts hardest (r9: a 17 s battery median
    // against a 1.7 s isolated re-read), so they always get a clean
    // isolated number printed next to the battery one.
    // movers judged on ratio-vs-calibration: a query moving WITH the
    // container (scale ≈ its own drift) is not a mover
    val movers = Bench.moversOf(results.map { case (n, _, w) => (n, w) },
      prior, calibScale)
    val slowest = results.sortBy(-_._3).take(8).map(_._1)
    val toIsolate = (movers ++ slowest).distinct.sorted

    // Fork-per-query re-runs on a quiet machine: the battery session is
    // STOPPED first so no child ever shares a JVM — or even a live
    // executor pool — with the 99-query battery whose cumulative state
    // is exactly what the isolated column exists to rule out.
    spark.stop()
    var anyInProcess = false
    val isolated = toIsolate.map { name =>
      name -> forkIsolated(name).getOrElse {
        // no forkable classpath (plain unforked `sbt run`): shared-JVM
        // fallback behind fresh barriers, flagged in the record
        anyInProcess = true
        val s = newSession()
        s.catalog.clearCache(); System.gc(); Thread.sleep(50)
        runQuery(s, sfDir, name)
        val runs = Seq.fill(3) {
          System.gc(); Thread.sleep(50); runQuery(s, sfDir, name)
        }.sorted
        runs(1)
      }
    }
    val isoMode = if (toIsolate.isEmpty) "none"
      else if (anyInProcess) "in_process_fallback" else "fork_per_query"

    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val iso = isolated.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val moverList = movers.sorted.map(m => s""""$m"""").mkString("[", ",", "]")
    val priorName = priorFile.map(f => s""""${f.getName}"""").getOrElse("null")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    // warm_total repeated as the LAST field: the driver wrapper keeps only
    // the final 2000 chars of stdout, and the head (where "value" sits)
    // gets truncated once the battery grows — the tail always survives.
    val calibJson = calib.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"isolated":$iso,"isolated_mode":"$isoMode","movers":$moverList,"prior_record":$priorName,"cold_total":$coldTotal,"sf":"$sfDir","calibration":$calibJson,"calibration_scale":$calibScale,"warm_total":$warmTotal}""")
    // SPARK_GRAFT_BENCH_OUT=<path>: also write the UNTRUNCATED flat
    // per-query map to a file. The driver wrapper keeps only the last
    // 2000 chars of stdout, so round-over-round diffs need a committed
    // full record (BENCH_r*.json.flat convention) — this emits it as
    // part of the same run instead of a hand-pasted copy.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { path =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        s"""{"queries":$qs,"calibration":$calibJson,"calibration_scale":$calibScale}""" + "\n")
    }
    org.apache.spark.sql.SparkSession.getDefaultSession.foreach(_.stop())
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

  /** Queries whose battery median moved vs the prior record AFTER
    * dividing out the container-calibration drift (`scale` — 1.0 when
    * the prior record has no calibration block): >20% either way for
    * anyone, or >15% for the 10 slowest (by current battery time) —
    * the expensive queries ARE the headline numbers, so smaller drifts
    * there deserve an isolated re-read (r8 verdict: q1_agg drifted +19%
    * across two rounds while sitting under the old 30% threshold).
    */
  def moversOf(results: Seq[(String, Double)], prior: Map[String, Double],
               scale: Double = 1.0): Seq[String] = {
    val top10 = results.sortBy(-_._2).take(10).map(_._1).toSet
    val s = if (scale > 0) scale else 1.0
    results.collect {
      case (name, w) if prior.get(name).exists { p =>
        val lim = if (top10(name)) 1.15 else 1.2
        val adj = p * s
        p > 0 && (w / adj > lim || adj / w > lim)
      } => name
    }
  }

  /** Calibration probe medians from a prior record, same three shapes
    * as [[parsePrior]] (own line / driver "parsed" / head-truncated
    * "tail"). Empty for records that predate the calibration block.
    */
  def parsePriorCalibration(f: java.io.File): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    def calibMap(root: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] =
      Option(root.get("calibration")).map { qs =>
        qs.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
      }.getOrElse(Map.empty[String, Double])
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val direct = calibMap(root)
      if (direct.nonEmpty) direct
      else {
        val parsed = Option(root.get("parsed")).filterNot(_.isNull)
          .map(calibMap).getOrElse(Map.empty[String, Double])
        if (parsed.nonEmpty) parsed
        else {
          val tail = Option(root.get("tail")).map(_.asText()).getOrElse("")
          """"calibration":\{([^}]*)\}""".r.findFirstMatchIn(tail).map { m =>
            """"(calib_[a-z]+)":([0-9]+(?:\.[0-9]+)?)""".r
              .findAllMatchIn(m.group(1))
              .map(x => x.group(1) -> x.group(2).toDouble).toMap
          }.getOrElse(Map.empty[String, Double])
        }
      }
    } catch { case _: Exception => Map.empty[String, Double] }
  }
}
