package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dynamic curation rules at ingest: the blocklist lives in a RULES
  * TABLE (parquet: one (lang, tok) row per blocked token), and the
  * screen re-reads it INSIDE every micro-batch (`foreachBatch` +
  * [[screened]]) — so operators update the rules file and the very
  * next batch enforces the new policy, no stream restart, no
  * redeploy. A plain stream-static join would NOT give this: a
  * parquet static side pins its file listing at query analysis, so
  * rule updates would be invisible until restart — the per-batch
  * fresh read is the load-bearing difference, and the spec proves a
  * mid-stream rule change takes effect on the next batch.
  */
object StreamingRules {

  /** One batch's verdicts under the rules CURRENTLY on disk: per doc,
    * the count of blocked (lang, token) hits and the clean flag. The
    * rules side broadcasts (policy tables are small by nature); the
    * token explode is per-row; the per-doc count is batch-sized.
    */
  def screened(docs: DataFrame, rulesDir: String): DataFrame = {
    val spark = docs.sparkSession
    val rules = spark.read.parquet(rulesDir).select("lang", "tok")
    val toks = docs.select(col("doc_id"), col("lang"),
      explode_outer(TextFunctions.tokens(col("text"))).as("tok"))
    toks.join(broadcast(rules.withColumn("hit", lit(1L))), Seq("lang", "tok"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("clean", col("n_hits") === 0L)
  }
}
