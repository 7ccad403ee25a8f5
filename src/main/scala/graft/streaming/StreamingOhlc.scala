package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming arm of the OHLC rollup (`ev_ohlc`): the same
  * min_by/max_by-on-a-(ts, id)-struct aggregate as the batch query,
  * run as a watermarked windowed streaming aggregation in APPEND mode
  * — each (event_type, hour) row is emitted exactly once, when the
  * watermark passes the window end and the bar is final. State is one
  * aggregation buffer per open window per type, retired by the
  * watermark — bounded by (types × open hours), never by stream
  * length.
  *
  * The batch differential (StreamingOhlcSpec) is exact equality:
  * min_by/max_by over a struct total order are order-independent
  * (the argmin of a total order does not depend on arrival order),
  * sums are exact DECIMAL, and the window start is the same
  * floor-to-hour as the batch `ts_us div 3600e6` bucket.
  */
object StreamingOhlc {

  def ohlcBars(stream: DataFrame, lateness: String = "30 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("event_type"), col("window.start").as("bar_start"),
        col("open"), col("close"), col("high"), col("low"),
        col("n_events"), col("sum_value"))
}
