package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed event aggregation, shared between the batch query surface
  * (q32) and Structured Streaming. The reference has no streaming
  * (SURVEY.md §2.11) — this is the beyond-reference path: the SAME
  * tumbling-window plan runs over a static frame or a stream, which is
  * exactly how a 100 TB event pipeline runs backfill and live ingest off
  * one operator definition.
  */
object EventStream {

  /** Tumbling-window per-type aggregate over (ts, event_type, value,
    * props). Window start aligns with date_trunc for whole-unit windows,
    * so any engine can recompute it. Grouping is by the `window` struct
    * itself (projected to `start` after the agg) — streaming watermark
    * propagation requires the event-time window in the grouping key. */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).cast("double").as("sum_value"),
        avg(get_json_object(col("props"), "$.k").cast("int")).as("avg_k"))
      // NTZ: parquet writes isAdjustedToUTC=false, matching engines that
      // treat event time as naive (session TZ is UTC, values unchanged)
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"), col("avg_k"))

  /** Streaming flavor: same aggregate with a watermark bound on state
    * (append mode emits a window only once it can no longer change). */
  def windowedAggStream(events: DataFrame, windowLength: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLength)
}
