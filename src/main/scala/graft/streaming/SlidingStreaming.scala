package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sliding-window aggregation — q177's overlapping 3-hour /
  * 1-hour-slide semantics kept live over an unbounded event stream via
  * Spark's native `window(ts, "3 hours", "1 hour")`.
  *
  * Where the batch side replicates each event to its 3 containing windows
  * with a bounded explode, the stream holds one aggregation state row per
  * OPEN (type, window) — the watermark closes windows `lateness` behind
  * the observed event-time maximum, so state is bounded by
  * types × (window/slide + lateness/slide) rows regardless of stream
  * length. The replay spec proves a drained stream's window table equals
  * the batch q177 aggregation over the same events row-for-row: same
  * integer quantization (the xsum discipline), same window membership,
  * `wend = end_hour − 1` aligning Spark's exclusive window.end with the
  * batch side's inclusive last-hour index.
  */
object SlidingStreaming {

  /** 3-hour windows advancing hourly over (event_type, value, ts_us µs)
    * rows. Use Update/Complete mode to observe open windows; in Append
    * mode rows emit once the watermark passes window.end. */
  def slidingHourly(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", lateness)
      .groupBy(col("event_type"), window(col("ts"), "3 hours", "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(1000000.0) + lit(0.5))).as("sv"))
      .select(col("event_type"),
        expr(s"unix_micros(window.end) div ${graft.queries.RelQueries.HourUs}L - 1")
          .as("wend"),
        col("n_events"), (col("sv") / lit(1000000.0)).as("sum_value"))
}
