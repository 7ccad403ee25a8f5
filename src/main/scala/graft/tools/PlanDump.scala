package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round instrument: dump `explain("formatted")` for
  * named SparkEntry queries to files, so plan claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Run: `sbt "runMain graft.tools.PlanDump <outDir> <suffix> [query ...]"`
  * — no query names = every declared query. Reads the same
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS contract as the bench.
  * Plans are ANALYSIS-ONLY (no execution): lake/pipeline queries that
  * mutate scratch state on build still run their builder (a query
  * function call), but nothing is collected.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = args.drop(1).headOption.getOrElse("before")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"PLANDUMP unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
            println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
          } catch {
            case t: Throwable =>
              System.err.println(s"PLANDUMP FAILED for $name: ${t.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
