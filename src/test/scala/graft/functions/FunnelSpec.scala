package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  private def registered = { FunnelAggs.register(spark); spark }

  // ----------------------------------------------------- funnelLevel (unit)

  private def lvl(window: Long, steps: Int, evs: (Long, Int)*): Int =
    FunnelAggs.funnelLevel(evs.map(_._1).toArray, evs.map(_._2).toArray, window, steps)

  test("funnelLevel: basic chains, window span, out-of-order input") {
    // masks: bit0 = step1, bit1 = step2, bit2 = step3
    assert(lvl(10, 3, (0L, 1), (1L, 2), (2L, 4)) == 3)
    assert(lvl(1, 3, (0L, 1), (1L, 2), (2L, 4)) == 2)  // span 2 > window 1 at step3
    assert(lvl(10, 3, (2L, 4), (0L, 1), (1L, 2)) == 3) // order-independent
    assert(lvl(10, 3, (0L, 2), (1L, 4)) == 0)          // no step1 at all
    assert(lvl(10, 3, (0L, 1), (1L, 4)) == 1)          // step3 without step2
  }

  test("funnelLevel: later restart wins when the window forces it") {
    // A@0 B@1, then A@5 B@6 C@7 with window 3: only the restarted chain
    // reaches level 3 (7-0 > 3 but 7-5 <= 3)
    assert(lvl(3, 3, (0L, 1), (1L, 2), (5L, 1), (6L, 2), (7L, 4)) == 3)
    // without the restart the same suffix fails
    assert(lvl(3, 3, (0L, 1), (1L, 2), (7L, 4)) == 2)
  }

  test("funnelLevel: strictly increasing ts — ties cannot chain") {
    assert(lvl(10, 2, (1L, 1), (1L, 2)) == 1)          // same-ts pair: no chain
    assert(lvl(10, 2, (1L, 3)) == 1)                   // one event matching both steps
    assert(lvl(10, 2, (1L, 1), (2L, 2)) == 2)
    // tie batch still applies against PRE-batch state
    assert(lvl(10, 3, (0L, 1), (1L, 2), (1L, 4)) == 2) // step2@1 and step3@1 tie
    assert(lvl(10, 3, (0L, 1), (1L, 2), (2L, 4)) == 3)
  }

  test("funnelLevel: window boundary is inclusive") {
    assert(lvl(2, 2, (0L, 1), (2L, 2)) == 2)
    assert(lvl(1, 2, (0L, 1), (2L, 2)) == 1)
  }

  // ------------------------------------------------- funnelMatches (greedy)

  private def fm(window: Long, steps: Int, evs: (Long, Int)*): Seq[(Long, Long)] =
    FunnelAggs.funnelMatches(evs.map(_._1).toArray, evs.map(_._2).toArray, window, steps)

  test("funnelMatches: greedy non-overlapping completions with spans") {
    assert(fm(10, 3, (0L, 1), (1L, 2), (2L, 4)) == Seq((0L, 2L)))
    // second chain after the first completes; events before an end are consumed
    assert(fm(10, 2, (0L, 1), (1L, 2), (2L, 1), (3L, 2)) == Seq((0L, 1L), (2L, 3L)))
    // VVPP consumes both V's at the first P: only ONE match
    assert(fm(10, 2, (0L, 1), (1L, 1), (2L, 2), (3L, 2)) == Seq((1L, 2L)))
    // window forces a restart; start is the LATEST feasible anchor
    assert(fm(3, 3, (0L, 1), (1L, 2), (5L, 1), (6L, 2), (7L, 4)) == Seq((5L, 7L)))
    assert(fm(10, 2, (0L, 2), (1L, 1)) == Nil)
    // single-step funnel: every step-1 event is its own match
    assert(fm(10, 1, (0L, 1), (1L, 1)) == Seq((0L, 0L), (1L, 1L)))
  }

  test("funnelMatches count agrees with the funnel level reaching N") {
    // whenever level == N there is at least one match and vice versa
    val cases = Seq(
      Seq((0L, 1), (1L, 2), (2L, 4)),
      Seq((0L, 1), (5L, 2), (20L, 4)),
      Seq((0L, 4), (1L, 2), (2L, 1)),
      Seq((0L, 1), (1L, 2)))
    cases.foreach { evs =>
      val lvl = FunnelAggs.funnelLevel(evs.map(_._1).toArray, evs.map(_._2).toArray, 10L, 3)
      val n = fm(10, 3, evs: _*).size
      assert((lvl == 3) == (n > 0), s"level $lvl vs $n matches for $evs")
    }
  }

  // --------------------------------------------------- aggregate (dataframe)

  test("graft_window_funnel merges partial states across partitions") {
    val s = registered
    import s.implicits._
    // user 1: full chain within window; user 2: chain broken by window;
    // 8 input partitions force serialize + merge of partial states
    val rows = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      (2L, 100L, "a"), (2L, 200L, "b"), (2L, 100000L, "c"),
      (3L, 100L, "b"), (3L, 200L, "c"))
    val df = s.sparkContext.parallelize(rows, 8).toDF("u", "t", "e")
    val out = df.groupBy("u").agg(
        expr("graft_window_funnel(1000, t, e = 'a', e = 'b', e = 'c')").as("lvl"))
      .orderBy("u").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 3), (2L, 2), (3L, 0)))
  }

  test("graft_retention: first-step gating and partition merge") {
    val s = registered
    import s.implicits._
    val rows = Seq(
      (1L, "signup"), (1L, "purchase"),            // r = [T, T, F]
      (2L, "purchase"), (2L, "error"),             // no signup → all false
      (3L, "signup"),                              // only first step
      (4L, "error"), (4L, "signup"))               // order irrelevant → [T, F, T]
    val df = s.sparkContext.parallelize(rows, 8).toDF("u", "e")
    val out = df.groupBy("u").agg(
        expr("graft_retention(e = 'signup', e = 'purchase', e = 'error')").as("r"))
      .selectExpr("u", "r[0]", "r[1]", "r[2]")
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, true, true, false), (2L, false, false, false),
      (3L, true, false, false), (4L, true, false, true)))
  }

  test("graft_retention participates in codegen (declarative, no fallback)") {
    val s = registered
    import s.implicits._
    val df = s.range(0, 100, 1, 4).select((col("id") % 10).as("u"),
      concat(lit("e"), col("id") % 3).as("e"))
    val plan = df.groupBy("u").agg(
      expr("graft_retention(e = 'e0', e = 'e1')").as("r"))
    // HashAggregate (not ObjectHashAggregate/SortAggregate) ⇒ the unsafe-row
    // buffer path DeclarativeAggregate enables
    val phys = plan.queryExecution.executedPlan.toString
    assert(phys.contains("HashAggregate"), s"expected HashAggregate in:\n$phys")
  }
}
