package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for a session-conf toggle: run each named
  * query alternating `<conf>=true` / `<conf>=false` inside ONE
  * session, report per-arm medians. Container drift (external load on
  * the shared box) hits both arms equally, so the ratio is honest
  * where two separate bench takes are not.
  *
  * Run: `runMain graft.tools.AbToggle <conf> <rounds> <query> [query...]`
  * (reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like the bench).
  * Cache is cleared before every run so internal persists rebuild —
  * both arms pay full construction.
  */
object AbToggle {
  def main(args: Array[String]): Unit = {
    val conf = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(flag: Boolean): Double = {
        spark.conf.set(conf, flag.toString)
        spark.catalog.clearCache(); System.gc(); Thread.sleep(30)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(true); run(false) // JIT/codegen warmup for both plan shapes
      val on = Seq.newBuilder[Double]
      val off = Seq.newBuilder[Double]
      (1 to rounds).foreach { _ => on += run(true); off += run(false) }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val (mOn, mOff) = (med(on.result()), med(off.result()))
      println(f"AB $name%-32s on=$mOn%7.3f off=$mOff%7.3f on/off=${mOn / mOff}%5.2f")
    }
    spark.stop()
  }
}
