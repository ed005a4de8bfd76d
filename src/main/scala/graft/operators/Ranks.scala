package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank — the scalable replacement for
  * `row_number().over(Window.orderBy(...))`, which plans a SINGLE
  * partition (one task sorts the entire input; Spark even warns about
  * it). Fine for a bounded metadata table, fatal for anything
  * corpus-shaped — a 100 TB web corpus has 10^8-10^9 distinct tokens,
  * so a vocabulary is tens of GB, not "megabytes".
  *
  * Shape: range-repartition on the sort keys (partition i holds keys
  * strictly below partition i+1's), rank locally inside each partition,
  * then add per-partition offsets — a cumulative sum over the
  * partition-count table, which has exactly numPartitions rows, the one
  * place a single-partition window is the CORRECT plan. Every stage is
  * Catalyst-visible; no RDD round-trip, no driver collect.
  */
object Ranks {

  /** Append a 1-based global `row_number`-equivalent rank over `sortCols`
    * (ties broken arbitrarily but deterministically only if `sortCols`
    * form a unique key — same contract as row_number). */
  def globalRowNumber(df: DataFrame, rankCol: String,
                      sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // Local rank: the window partitions by __pid, whose values are the
    // range-partition ids, so ordering (pid, local rank) == global order.
    // PERSISTED: `local` feeds BOTH the offsets aggregate and the final
    // join — recomputed independently, RangePartitioner's reservoir
    // sampling can pick different boundaries per computation, and
    // offsets from one partitioning are garbage against local ranks of
    // another (observed: missing + duplicated global ranks). The cache
    // pins ONE materialization for both consumers; Broadcasts.release
    // evicts it with the rest of the library's per-query persists.
    val local = Broadcasts.trackedPersist(
      parted.withColumn("__lrk", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*))))
    // numPartitions rows -> the cumulative-offset window is bounded.
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(rankCol, (col("__off") + col("__lrk")).cast("long"))
      .drop("__pid", "__lrk", "__off")
  }

  /** Distributed global CUMULATIVE SUM of `sumCol` in `sortCols` order —
    * the scalable replacement for `sum(c).over(Window.orderBy(...))`,
    * which (like the global rank) plans a single partition. Same shape
    * as [[globalRowNumber]]: range-repartition on the sort keys, local
    * running sum per partition, add per-partition offsets (a cumulative
    * window over the numPartitions-row totals table — the one place a
    * single-partition window is the correct plan). Inclusive of the
    * current row; `sortCols` must be a unique key for a deterministic
    * result (same contract as the window form over distinct keys). */
  def globalCumSum(df: DataFrame, sumCol: String, outCol: String,
                   sortCols: Column*): DataFrame = {
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    // persisted for the same two-consumer reason as globalRowNumber's
    // local: offsets must be computed against the SAME range partitioning
    // the join side reads
    val local = Broadcasts.trackedPersist(
      parted.withColumn("__lcs", sum(col(sumCol)).over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*))))
    val offsets = local.groupBy("__pid").agg(sum(col(sumCol)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__lcs"))
      .drop("__pid", "__lcs", "__off")
  }
}
