package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("point-in-interval: inclusive bounds, multi-bucket intervals, no dupes") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // exactly at i10 start (inclusive)
      (2L, ts("2024-01-01 10:25:00")),  // inside i10, crosses a bucket
      (3L, ts("2024-01-01 10:30:00")),  // exactly at i10 end (inclusive) AND inside i20
      (4L, ts("2024-01-01 12:00:00")),  // no interval
      (5L, ts("2024-01-01 10:29:59"))   // in both i10 and i20 (overlap region)
    ).toDF("pid", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")), // spans 4 buckets at 600s
      (20L, ts("2024-01-01 10:20:00"), ts("2024-01-01 11:00:00"))
    ).toDF("iid", "start_ts", "end_ts")

    val out = RangeJoin.pointInInterval(points, intervals, "ts", "start_ts", "end_ts")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (1L, 10L), (2L, 10L), (3L, 10L), (5L, 10L),
      (2L, 20L), (3L, 20L), (5L, 20L)))

    // each (point, interval) appears exactly once even though interval 10
    // explodes into several buckets
    val n = RangeJoin.pointInInterval(points, intervals, "ts", "start_ts", "end_ts").count()
    assert(n == 7)
  }

  test("plan is an equi-join on the bucket — no cartesian/nested-loop") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "ts")
    val intervals = Seq((10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("iid", "start_ts", "end_ts")
    val plan = RangeJoin.pointInInterval(points, intervals, "ts", "start_ts", "end_ts")
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join degenerated to a non-equi join:\n$plan")
  }

  test("extra equi keys restrict matches per key") {
    val points = Seq(
      ("u1", ts("2024-01-01 10:05:00")),
      ("u2", ts("2024-01-01 10:05:00"))).toDF("user", "ts")
    val intervals = Seq(
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      .toDF("user", "start_ts", "end_ts")
    val out = RangeJoin.pointInInterval(points, intervals, "ts", "start_ts", "end_ts",
      keys = Seq("user")).select("user").collect().map(_.getString(0)).toSeq
    assert(out == Seq("u1"))
  }

  test("driver entry p22 on sf0.001: every incident window contains its own seed event") {
    val df = graft.SparkEntry.queries("p22_range_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length > 0 && rows.length <= 20)
    assert(rows.forall(_.getLong(1) >= 1)) // n_events >= 1 (the error event itself)
  }

  test("intervalOverlap: exactly-once pairs equal the brute-force theta join") {
    // long intervals spanning MANY 600s buckets — a pair shares dozens of
    // buckets, so any double emission would show immediately
    val a = Seq(
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 06:00:00")),
      (2L, ts("2024-01-01 05:59:00"), ts("2024-01-01 07:00:00")),
      (3L, ts("2024-01-01 08:00:00"), ts("2024-01-01 08:00:00"))  // degenerate point
    ).toDF("aid", "s1", "e1")
    val b = Seq(
      (10L, ts("2024-01-01 03:00:00"), ts("2024-01-01 09:00:00")), // overlaps all three
      (20L, ts("2024-01-01 06:30:00"), ts("2024-01-01 06:40:00")), // only aid 2
      (30L, ts("2024-01-01 09:30:00"), ts("2024-01-01 09:40:00"))  // none
    ).toDF("bid", "s2", "e2")
    val got = RangeJoin.intervalOverlap(a, b, "s1", "e1", "s2", "e2")
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    val want = a.crossJoin(b)
      .filter(col("s1") <= col("e2") && col("s2") <= col("e1"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(want === Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L)))
  }

  test("intervalOverlap honors extra equi keys") {
    val a = Seq(("k1", 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      ("k2", 2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("k", "aid", "s1", "e1")
    val b = Seq(("k1", 10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")))
      .toDF("k", "bid", "s2", "e2")
    val got = RangeJoin.intervalOverlap(a, b, "s1", "e1", "s2", "e2", keys = Seq("k"))
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L))) // k2's identical interval is keyed away
  }
}
