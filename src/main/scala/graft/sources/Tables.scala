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

  /** The event-stream table. `ts` comes back as a proper TIMESTAMP
    * (microsecond precision) and `ts_us` as the raw unix microseconds
    * (bigint — what oracle comparisons use, `epoch_us(ts)` in DuckDB).
    *
    * Driver datasets have carried two physical encodings of `ts`
    * across rounds — TIMESTAMP(NANOS) (Spark 4 reads it as a nanos
    * long only under `nanosAsLong`) and plain TIMESTAMP_NTZ(us) — so
    * both are handled here by schema inspection. Under the session's
    * fixed UTC timezone the NTZ→TIMESTAMP cast is the identity on the
    * underlying micros, matching DuckDB's naive-UTC read exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below reads micros through the SESSION
    // timezone; every shipped entrypoint pins UTC, but a new caller
    // without it would silently shift ts/ts_us — pin it here too, next
    // to the other read-path conf this loader already owns.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long files
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ microsecond files
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
