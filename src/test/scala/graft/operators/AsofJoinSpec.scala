package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, 1L),
      (1L, ts("2024-01-01 10:00:05"), 101.0, 2L),
      (1L, ts("2024-01-01 10:00:05"), 102.0, 3L), // tie at same (key, ts)
      (1L, ts("2024-01-01 10:01:00"), 103.0, 4L),
      (2L, ts("2024-01-01 10:00:30"), 200.0, 5L)
    ).toDF("sym", "ts", "px", "qid")
  }

  private lazy val trades: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 09:59:59"), 10),   // before any quote
      (1L, ts("2024-01-01 10:00:05"), 20),   // exactly at a quote ts (inclusive)
      (1L, ts("2024-01-01 10:00:30"), 30),   // between quotes
      (2L, ts("2024-01-01 10:00:29"), 40),   // 1s before sym-2's only quote
      (3L, ts("2024-01-01 10:00:00"), 50)    // key with no quotes at all
    ).toDF("sym", "ts", "size")
  }

  private def rows(df: DataFrame): Set[(Long, Int, Option[Double])] =
    df.collect().map(r => (r.getLong(0), r.getInt(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

  test("backward picks latest right row at-or-before, tie-broken, outer for misses") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
      payload = Seq("px"), tieBreak = Some("qid"))
    assert(out.columns.toSeq == Seq("sym", "ts", "size", "r_px"))
    assert(rows(out) == Set(
      (1L, 10, None),          // no quote yet
      (1L, 20, Some(102.0)),   // equal-ts quote matches; qid=3 wins the tie
      (1L, 30, Some(102.0)),   // carried forward past the tie
      (2L, 40, None),          // quote is 1s in the future
      (3L, 50, None)))         // key never quoted
  }

  test("forward picks earliest right row at-or-after") {
    val out = AsofJoin.forward(trades, quotes, Seq("sym"), "ts", "ts",
      payload = Seq("px"), tieBreak = Some("qid"))
    assert(rows(out) == Set(
      (1L, 10, Some(100.0)),
      (1L, 20, Some(102.0)),   // equal ts is inclusive; largest tie-break wins
      (1L, 30, Some(103.0)),
      (2L, 40, Some(200.0)),
      (3L, 50, None)))
  }

  test("tolerance nulls out stale matches but keeps the row (left-outer)") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
      payload = Seq("px"), toleranceSec = Some(10), tieBreak = Some("qid"))
    assert(rows(out) == Set(
      (1L, 10, None),
      (1L, 20, Some(102.0)),   // gap 0 <= 10s
      (1L, 30, None),          // gap 25s > 10s → dropped payload, row kept
      (2L, 40, None),
      (3L, 50, None)))
  }

  test("a matched row's NULL payload stays NULL — no back-fill from older rows") {
    import spark.implicits._
    // the matched (latest) quote has px = NULL; a naive per-column fill
    // would inherit 100.0 from the older row
    val q = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(100.0), 1L),
      (1L, ts("2024-01-01 10:30:00"), None: Option[Double], 2L)
    ).toDF("sym", "ts", "px", "qid")
    val t = Seq((1L, ts("2024-01-01 10:31:00"), 1)).toDF("sym", "ts", "size")
    val out = AsofJoin.backward(t, q, Seq("sym"), "ts", "ts",
      payload = Seq("px", "qid"), toleranceSec = Some(300))
    val row = out.head()
    assert(row.isNullAt(3), s"NULL payload of the matched row leaked a stale value: $row")
    assert(row.getLong(4) == 2L) // but the row IS the 10:30 match
  }

  test("plan is a single window pass — no join node") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
      payload = Seq("px"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in plan:\n$plan")
  }

  test("driver entry p15 runs and matches expected shape on sf0.001") {
    val df = graft.SparkEntry.queries("p15_asof_join")(spark, "/root/testdata/sf0.001")
    val n = df.count()
    assert(n > 0)
    // every non-null gap is non-negative (click at or before the purchase)
    assert(df.filter(col("gap_us") < 0).count() == 0)
  }
}
