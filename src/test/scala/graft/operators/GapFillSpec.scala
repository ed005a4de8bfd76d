package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("grid covers [first,last] hour per key, gaps forward-fill, bucket picks last event") {
    val ev = Seq(
      // user 1: events at 00:10, 00:50 (same bucket — later wins), gap
      // at 01:xx, then 02:05; grid must be 00,01,02
      (1L, ts("2024-01-01 00:10:00"), 10.0, 100L),
      (1L, ts("2024-01-01 00:50:00"), 20.0, 101L),
      (1L, ts("2024-01-01 02:05:00"), 30.0, 102L),
      // user 2: a single event — one grid row, had_event true
      (2L, ts("2024-01-01 05:30:00"), 7.0, 200L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = GapFill.forwardFillGrid(ev, "user_id", "ts", "value", "event_id")
      .orderBy("user_id", "bucket_ts")
      .select(col("user_id"), col("bucket_ts").cast("string"),
        col("value_ff"), col("had_event"))
      .as[(Long, String, Double, Boolean)].collect()
    assert(out === Array(
      (1L, "2024-01-01 00:00:00", 20.0, true),  // later event in bucket wins
      (1L, "2024-01-01 01:00:00", 20.0, false), // gap row exists, carries 20
      (1L, "2024-01-01 02:00:00", 30.0, true),
      (2L, "2024-01-01 05:00:00", 7.0, true)))
  }

  test("equal-ts events in one bucket break ties on the tie column") {
    val t0 = ts("2024-01-01 00:00:00")
    val ev = Seq((1L, t0, 1.0, 5L), (1L, t0, 2.0, 9L), (1L, t0, 3.0, 7L))
      .toDF("user_id", "ts", "value", "event_id")
    val v = GapFill.forwardFillGrid(ev, "user_id", "ts", "value", "event_id")
      .select("value_ff").as[Double].head()
    assert(v === 2.0) // event_id 9 is the arg-max of (ts, event_id)
  }
}
