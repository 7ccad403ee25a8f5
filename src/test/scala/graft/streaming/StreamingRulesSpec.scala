package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic-rules contract: a mid-stream rules-table update must take
  * effect on the very next micro-batch (no restart), each batch's
  * verdicts must equal the batch-mode screen under the rules in force
  * at that moment, and the rule change must actually flip at least one
  * verdict (so the test can't pass vacuously).
  */
class StreamingRulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def writeRules(rulesDir: String, rules: Seq[(String, String)]): Unit = {
    import spark.implicits._
    rules.toDF("lang", "tok").coalesce(1)
      .write.mode("overwrite").parquet(rulesDir)
  }

  test("a rules update lands on the next micro-batch without restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rulesDir = java.nio.file.Files.createTempDirectory("graft-rules").toString
    val v1 = Seq("en" -> "error")
    val v2 = Seq("en" -> "error", "de" -> "slow", "fr" -> "dup")
    writeRules(rulesDir, v1)

    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text")
    val docs = all.as[(Long, String, String)].collect().sortBy(_._1)
    val (half1, half2) = docs.splitAt(docs.length / 2)

    val mem = MemoryStream[(Long, String, String)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = mem.toDF().toDF("doc_id", "lang", "text")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= StreamingRules.screened(b, rulesDir).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        }
        ()
      }
      .start()
    try {
      mem.addData(half1.toIndexedSeq)
      q.processAllAvailable()
      val afterB1 = seen.synchronized(seen.toVector)

      writeRules(rulesDir, v2)
      mem.addData(half2.toIndexedSeq)
      q.processAllAvailable()
      val afterB2 = seen.synchronized(seen.toVector).drop(afterB1.size)

      def batchRef(rows: Seq[(Long, String, String)],
                   rules: Seq[(String, String)]): Seq[(Long, Long, Boolean)] = {
        val tmp = java.nio.file.Files.createTempDirectory("graft-rules-ref").toString
        writeRules(tmp, rules)
        StreamingRules.screened(
          rows.toDF("doc_id", "lang", "text"), tmp).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      }
      assert(afterB1.sorted == batchRef(half1.toIndexedSeq, v1).sorted)
      assert(afterB2.sorted == batchRef(half2.toIndexedSeq, v2).sorted)
      // the update must BITE: under v1 those same docs screen cleaner
      val underV1 = batchRef(half2.toIndexedSeq, v1)
      assert(underV1.count(!_._3) < afterB2.count(!_._3),
        "v2 rules must flag docs the v1 rules missed")
    } finally q.stop()
  }
}
