package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second join shape Spark has no
  * native operator for (after as-of). A naive `a.join(b, a.ts between
  * b.start and b.end)` has no equi-condition, so Catalyst plans a
  * nested-loop/cartesian: O(points × intervals). This operator
  * BUCKETIZES time instead: each interval explodes into the coarse
  * buckets it covers, each point maps to exactly ONE bucket, and the
  * join becomes an equi-join on (bucket [, keys…]) followed by the exact
  * containment filter. Because a point owns a single bucket, a
  * (point, interval) pair can meet in at most one bucket — no dedup
  * stage exists.
  *
  * Scale: shuffle keyed by bucket (plus any equi keys); interval rows
  * replicate by ceil(len/bucket)+1 — pick `bucketSeconds` near the
  * typical interval length so the blow-up stays ~2× while buckets stay
  * selective. Hot buckets (everything overlapping one rush hour) are the
  * skew source; shrink the bucket or add a salt key upstream.
  */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row whose
    * [startCol, endCol] contains pointTs (inclusive both ends), matching
    * any extra equi `keys` exactly. Column names must be disjoint apart
    * from `keys`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      keys: Seq[String] = Nil,
                      bucketSeconds: Long = 600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val usPerBucket = bucketSeconds * 1000000L
    val pb = points.withColumn("__bucket",
      floor(unix_micros(col(pointTs)) / usPerBucket))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / usPerBucket),
        floor(unix_micros(col(endCol)) / usPerBucket))))
    pb.join(ib, Seq("__bucket") ++ keys)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: every (left, right) pair whose closed
    * intervals intersect ([ls,le] ∩ [rs,re] ≠ ∅), matching extra equi
    * `keys` exactly. Both sides replicate into their covered buckets,
    * so a true pair can meet in SEVERAL buckets; instead of a distinct
    * (a shuffle over the full pair set), each pair is emitted only from
    * its canonical bucket — the bucket of max(ls, rs), the first bucket
    * the pair shares — making the output exactly-once by construction.
    * Same scale levers as pointInInterval: bucket near the typical
    * interval length, salt hot buckets upstream. Column names must be
    * disjoint apart from `keys`. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      keys: Seq[String] = Nil,
                      bucketSeconds: Long = 600): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val usPerBucket = bucketSeconds * 1000000L
    def buckets(s: String, e: String) = explode(sequence(
      floor(unix_micros(col(s)) / usPerBucket),
      floor(unix_micros(col(e)) / usPerBucket)))
    val lb = left.withColumn("__bucket", buckets(lStart, lEnd))
    val rb = right.withColumn("__bucket", buckets(rStart, rEnd))
    lb.join(rb, Seq("__bucket") ++ keys)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") ===
        floor(unix_micros(greatest(col(lStart), col(rStart))) / usPerBucket))
      .drop("__bucket")
  }
}
