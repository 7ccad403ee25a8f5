package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (repo TESTDATA.md).
  *
  * All queries go through here so scale-dependent reading concerns live
  * in one place:
  *   - `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses
  *     by default; we flip `spark.sql.legacy.parquet.nanosAsLong` and
  *     materialize both an exact `ts_us` (unix microseconds, bigint —
  *     what oracle comparisons use) and a `ts` TIMESTAMP column.
  *   - nothing is cached here: at 100 TB these are scans, and callers
  *     should let Catalyst prune columns/partitions per query.
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  // driver-side row-count cache, keyed by table path. For parameter
  // auto-tuning (SemDedup.autoBits needs ~log2(n)) — the count is paid
  // once per table per session instead of once per query invocation.
  // Immutable driver test data; a real deployment with appending
  // tables would key this by snapshot/version instead.
  private val rowCounts = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Exact row count of `dir/name.parquet`, cached on the driver. */
  def cachedCount(s: SparkSession, d: String, name: String): Long =
    rowCounts.getOrElseUpdate(s"$d/$name", read(s, d, name).count())

  /** Fan a narrow scan out to the session's parallelism when the
    * source supplies fewer partitions than cores. The driver fixtures
    * are single-file, SINGLE-ROW-GROUP parquet, so Spark plans every
    * scan as ONE task and the whole pre-exchange stage (tokenize /
    * md5 / shingle / JSON-render — the expensive part of the text and
    * pipeline operators) runs on one core of 32 (guide §2.5: input
    * skew, "repartition immediately after the read"). Scale-adaptive
    * by construction: a production-sized table scans with >= cores
    * input partitions and passes through UNTOUCHED — no payload
    * shuffle is added at scale, the exchange exists exactly when the
    * input cannot feed the cores. Callers put this AFTER the narrow
    * column select so the exchange carries only needed columns, and
    * only on queries whose downstream order does not depend on
    * partition layout (everything oracle-checked orders its output).
    */
  def fanout(df: DataFrame): DataFrame = {
    // conf-gated (default on) so the effect is A/B-able INSIDE one
    // session — on a container with drifting external load, an
    // interleaved same-JVM toggle is the only honest comparison
    if (df.sparkSession.conf.get("graft.fanout", "true") == "false") return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** The event-stream table. `ts` comes back as a proper TIMESTAMP
    * (microsecond precision) and `ts_us` as the raw unix microseconds
    * (bigint — what oracle comparisons use, `epoch_us(ts)` in DuckDB).
    *
    * Driver datasets have carried two physical encodings of `ts`
    * across rounds — TIMESTAMP(NANOS) (Spark 4 reads it as a nanos
    * long only under `nanosAsLong`) and plain TIMESTAMP_NTZ(us) — so
    * both are handled here by schema inspection. The NTZ path derives
    * micros by pure wall-clock arithmetic (`timestampdiff` between two
    * NTZ values) — timezone-INDEPENDENT, matching DuckDB's naive-UTC
    * read exactly no matter what session timezone the caller runs
    * under; this loader mutates no session timezone state. (Rendering
    * those timestamps as strings is still session-tz-dependent, as in
    * any Spark job — every shipped entrypoint pins UTC for that.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long files
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType => // TIMESTAMP_NTZ(us) files
        raw.withColumn("ts_us",
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ => // proper TIMESTAMP (instant) files: unix_micros is tz-free
        raw.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
