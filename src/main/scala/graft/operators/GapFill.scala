package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + forward fill ("gap fill") — the IoT/metrics
  * shape relational engines bolt on as `GAP_FILL`/`time_bucket` and
  * Spark expresses with three primitives:
  *
  *   1. bucket:   per (key, bucket) the LAST event's value wins, with a
  *                deterministic (ts, tieCol) arg-max so cross-engine
  *                merge order can never pick a different row;
  *   2. grid:     each key's [first, last] bucket span is expanded with
  *                `sequence()` + explode — rows appear for buckets with
  *                NO events (the whole point of the operator);
  *   3. fill:     ONE per-key window carries the last non-null value
  *                forward (`last(_, ignoreNulls = true)`).
  *
  * Scale shape: the bucket aggregate and the window both shuffle on the
  * key family, and AQE rides them on one exchange; grid expansion is
  * scan-local explode. Output size is keys × (span / step) — set `step`
  * from the span you actually query, because a dense grid over a sparse
  * series trades storage for O(1) point lookups (the canonical
  * materialized-resample tradeoff, independent of event count). Per-key
  * window state is one running value — bounded.
  */
object GapFill {

  /** Forward-filled per-key grid. Returns
    * (`keyCol`, bucket_ts, value_ff, had_event); bucket_ts steps by
    * `step` from each key's first event bucket to its last. `tieCol`
    * must make (ts, tieCol) unique per key (an event id). */
  def forwardFillGrid(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, tieCol: String,
                      bucket: String = "hour",
                      step: String = "1 hour"): DataFrame = {
    val e = events.select(col(keyCol).as("k"),
      date_trunc(bucket, col(tsCol)).as("bucket_ts"),
      col(tsCol).as("ts"), col(tieCol).as("tie"), col(valCol).as("v"))
    val perBucket = e.groupBy("k", "bucket_ts")
      .agg(max_by(col("v"), struct(col("ts"), col("tie"))).as("v"))
    val grid = e.groupBy("k")
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col("k"),
        explode(expr(s"sequence(lo, hi, interval $step)")).as("bucket_ts"))
    val w = Window.partitionBy("k").orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "bucket_ts"), "left")
      .select(col("k").as(keyCol), col("bucket_ts"),
        last(col("v"), ignoreNulls = true).over(w).as("value_ff"),
        col("v").isNotNull.as("had_event"))
  }
}
