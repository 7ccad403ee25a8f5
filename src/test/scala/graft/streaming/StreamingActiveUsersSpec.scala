package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming DAU/WAU arms must converge to the batch
  * `ev_active_users` numbers exactly, under any micro-batch chopping —
  * dropDuplicates state makes re-arrivals idempotent, so the final
  * update-mode counts equal the batch distincts.
  */
class StreamingActiveUsersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("streaming DAU and WAU converge to the batch dashboard across 4 micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.SparkEntry.queries("ev_active_users")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val rows = graft.sources.Tables.events(spark, dir)
      .select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toIndexedSeq

    def run(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
            name: String): Map[Long, Long] = {
      val mem = MemoryStream[(Long, Long)]
      val q = mk(mem.toDF().toDF("user_id", "ts_us"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        rows.grouped(rows.length / 4 + 1).foreach { c =>
          mem.addData(c); q.processAllAvailable()
        }
        // update mode re-emits a day each time its count grows; the
        // LAST emission per day is the converged value
        spark.table(name).groupBy("day")
          .agg(max(col(name.takeRight(3))).as("v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }

    val dau = run(StreamingActiveUsers.dauStream, "sau_dau")
    assert(dau.nonEmpty && dau == batch.map { case (d, (v, _)) => d -> v },
      "streaming DAU diverged from batch")
    val wau = run(StreamingActiveUsers.wauStream, "sau_wau")
    // the stream emits trailing partial windows past the last real
    // day; trim to the batch day set (the batch side joins real days)
    val wauTrim = wau.filter { case (d, _) => batch.contains(d) }
    assert(wauTrim == batch.map { case (d, (_, w)) => d -> w },
      "streaming WAU diverged from batch")
  }
}
