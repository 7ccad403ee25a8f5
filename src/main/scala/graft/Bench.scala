package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Each query runs twice and reports the
  * second (steady-state) time — the first run pays JVM/codegen JIT
  * that a long-lived cluster amortizes; cold totals are included for
  * transparency.
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val cold = timeOnce(fn)
      val warm = timeOnce(fn)
      (name, cold, warm)
    }
    val qs = results.map { case (k, _, w) => s""""$k":$w""" }.mkString("{", ",", "}")
    val coldTotal = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    println(s"""{"metric":"total","value":$warmTotal,"unit":"sec","queries":$qs,"cold_total":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
