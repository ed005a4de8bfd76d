package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequenceMatchSpec extends SparkSpec {

  import SequenceMatch._

  private def m(pattern: String, evs: (Long, Int)*): Boolean =
    matches(evs.map(_._1 * 1000000L).toArray, evs.map(_._2).toArray, parse(pattern))
  private def c(pattern: String, evs: (Long, Int)*): Int =
    countMatches(evs.map(_._1 * 1000000L).toArray, evs.map(_._2).toArray, parse(pattern))

  // masks: bit0 = cond1, bit1 = cond2, bit2 = cond3

  test("parser accepts anchors, gaps, time ops; rejects malformed patterns") {
    assert(parse("(?1)(?2)").seps == IndexedSeq(Adjacent))
    assert(parse("(?1).*(?2)").seps == IndexedSeq(Gap()))
    assert(parse("(?1)(?t<=30)(?2)").seps == IndexedSeq(Gap('≤', 30)))
    assert(parse("(?1).*(?t>5)(?2)").seps == IndexedSeq(Gap('>', 5)))
    intercept[IllegalArgumentException](parse("(?1)(?2")) // unbalanced
    intercept[IllegalArgumentException](parse(".*(?t>1)(?1)")) // leading t
    intercept[IllegalArgumentException](parse("(?1).*")) // trailing sep
  }

  test("gap pattern: order matters, any events between") {
    assert(m("(?1).*(?2)", (1L, 1), (2L, 4), (3L, 2)))
    assert(!m("(?1).*(?2)", (1L, 2), (2L, 1)))          // wrong order
    assert(m("(?1).*(?2).*(?3)", (1L, 1), (2L, 2), (3L, 4)))
    assert(!m("(?1).*(?2).*(?3)", (1L, 1), (3L, 4), (5L, 2))) // 3 before 2
  }

  test("adjacency: no relevant event may intervene") {
    assert(m("(?1)(?2)", (1L, 1), (2L, 2)))
    assert(!m("(?1)(?2)", (1L, 1), (2L, 4), (3L, 2)))   // cond3 event intervenes
    // an event matching NO condition would be skipped at update() and
    // never reach the matcher — adjacency is over the relevant sequence
    assert(m("(?1)(?1)(?2)", (1L, 1), (2L, 1), (3L, 2)))
  }

  test("time constraints bound the two adjacent anchors") {
    assert(m("(?1)(?t<=10)(?2)", (0L, 1), (10L, 2)))
    assert(!m("(?1)(?t<10)(?2)", (0L, 1), (10L, 2)))
    assert(m("(?1)(?t>5)(?2)", (0L, 1), (6L, 2)))
    assert(!m("(?1)(?t>5)(?2)", (0L, 1), (5L, 2)))
    assert(m("(?1)(?t==7)(?2)", (0L, 1), (7L, 2)))
    // tight window picks the LATEST qualifying first anchor
    assert(m("(?1)(?t<=3)(?2)", (0L, 1), (8L, 1), (10L, 2)))
    // wide window picks the EARLIEST
    assert(m("(?1)(?t>5)(?2)", (0L, 1), (9L, 1), (10L, 2)))
  }

  test("equal timestamps cannot chain (strict-ts transitions, like the funnel)") {
    // gap: view@T purchase@T is NOT view-then-purchase — the oracle's
    // b.t > a.t and this matcher must agree run-to-run
    assert(!m("(?1).*(?2)", (1L, 1), (1L, 2)))
    assert(m("(?1).*(?2)", (1L, 1), (1L, 2), (2L, 2))) // later event chains
    // adjacency: a tie at the link is blocked too
    assert(!m("(?1)(?2)", (1L, 1), (1L, 2)))
    // time window over a tie: still no chain even though delta 0 ≤ bound
    assert(!m("(?1)(?t<=5)(?2)", (1L, 1), (1L, 2)))
    assert(!m("(?1)(?t==0)(?2)", (1L, 1), (1L, 2)))
  }

  test("adjacency over ties: predecessor is the tie-GROUP, not the array slot") {
    // view@1, click@1, click@2: the tied click occupies the adjacent
    // array slot, but the oracle's NOT-EXISTS(a.t < x.t < b.t) sees
    // view@1 → click@2 as adjacent (nothing STRICTLY between). The
    // matcher must agree on any data draw (ADVICE r5, equal-µs ties).
    assert(m("(?1)(?2)", (1L, 1), (1L, 2), (2L, 2)))
    // but a relevant event at a strictly-between ts still blocks
    assert(!m("(?1)(?2)", (1L, 1), (2L, 4), (3L, 2))) // cond3@2 blocks ts1→ts3
    // tie INSIDE the predecessor group: any member matching suffices
    assert(m("(?1)(?2)", (1L, 1), (1L, 4), (2L, 2)))
    // tie at the successor: both tied events see the same predecessor
    assert(m("(?1)(?2)", (1L, 1), (2L, 4), (2L, 2)))
  }

  test("count: greedy non-overlapping, resumes after each match") {
    assert(c("(?1).*(?2)", (1L, 1), (2L, 2), (3L, 1), (4L, 2)) == 2)
    assert(c("(?1).*(?2)", (1L, 1), (2L, 1), (3L, 2), (4L, 2)) == 1) // VVPP
    assert(c("(?1).*(?2)", (1L, 2), (2L, 1)) == 0)
    assert(c("(?1).*(?2)", (1L, 1), (2L, 2), (3L, 1)) == 1)
  }

  test("aggregate: partial-state merge across partitions") {
    SequenceMatch.register(spark)
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, 100L, "a"), (1L, 200L, "x"), (1L, 300L, "b"),   // a .* b with noise
      (2L, 100L, "b"), (2L, 200L, "a"),                    // wrong order
      (3L, 100L, "a"), (3L, 200L, "b"), (3L, 300L, "a"), (3L, 400L, "b"))
    val df = s.sparkContext.parallelize(rows, 8).toDF("u", "t", "e")
    val out = df.groupBy("u").agg(
        expr("graft_sequence_match('(?1).*(?2)', t, e = 'a', e = 'b')").as("m"),
        expr("graft_sequence_count('(?1).*(?2)', t, e = 'a', e = 'b')").as("c"))
      .orderBy("u").as[(Long, Boolean, Int)].collect()
    assert(out.toSeq == Seq((1L, true, 1), (2L, false, 0), (3L, true, 2)))
  }
}
