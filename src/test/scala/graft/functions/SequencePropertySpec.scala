package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-check of the set-DP matchers against brute-force
  * reference implementations (exhaustive subsequence enumeration).
  * Timestamps are DISTINCT by construction — tie semantics are pinned
  * separately in FunnelSpec/SequenceMatchSpec unit tests (the brute
  * matcher's index-adjacency would differ on ties by design). */
class SequencePropertySpec extends AnyFunSuite {

  import SequenceMatch._

  private def tsOkRef(op: Char, delta: Long, secs: Long): Boolean = {
    val b = secs * 1000000L
    op match {
      case 0 => true
      case '<' => delta < b
      case '≤' => delta <= b
      case '>' => delta > b
      case '≥' => delta >= b
      case '=' => delta == b
    }
  }

  /** earliest match end index over events[from..), or -1 — by exhaustive
    * recursion over index assignments. */
  private def bruteMatchEnd(ts: Array[Long], mask: Array[Int], p: Pattern,
                            from: Int): Int = {
    val n = ts.length
    def assignments(k: Int, lastIdx: Int): Seq[Int] =
      if (k == p.anchors.length) Seq(lastIdx)
      else {
        val bit = 1 << (p.anchors(k) - 1)
        (from until n).flatMap { q =>
          val condOk = (mask(q) & bit) != 0
          val sepOk = k == 0 || (p.seps(k - 1) match {
            case Adjacent => q == lastIdx + 1
            case Gap(op, s) => q > lastIdx && tsOkRef(op, ts(q) - ts(lastIdx), s)
          })
          if (condOk && sepOk) assignments(k + 1, q) else Nil
        }
      }
    val ends = assignments(0, -1)
    if (ends.isEmpty) -1 else ends.min + 1
  }

  private def bruteCount(ts: Array[Long], mask: Array[Int], p: Pattern): Int = {
    var from = 0
    var c = 0
    while (from < ts.length) {
      val end = bruteMatchEnd(ts, mask, p, from)
      if (end < 0) return c
      c += 1
      from = end
    }
    c
  }

  /** brute funnel level: longest prefix of steps realizable as a
    * strictly-increasing chain with span ≤ window. */
  private def bruteLevel(ts: Array[Long], mask: Array[Int],
                         window: Long, steps: Int): Int = {
    val n = ts.length
    // level L = exists strictly-increasing chain of steps 1..L, span ≤ window
    (steps to 1 by -1).find { l =>
      def chain(k: Int, lastIdx: Int, startTs: Long): Boolean =
        if (k > l) true
        else (0 until n).exists { q =>
          (mask(q) & (1 << (k - 1))) != 0 &&
            (k == 1 || q > lastIdx) && {
              val st = if (k == 1) ts(q) else startTs
              ts(q) - st <= window && chain(k + 1, q, st)
            }
        }
      chain(1, -1, 0L)
    }.getOrElse(0)
  }

  test("set-DP sequence matcher ≡ brute force on 400 random cases") {
    val rnd = new scala.util.Random(2024)
    val sepPool: Seq[String] = Seq("", ".*", "(?t<=5)", "(?t>3)", "(?t<2)", "(?t>=4)")
    var checkedMatches = 0
    for (_ <- 1 to 400) {
      val nConds = 2 + rnd.nextInt(2) // 2..3
      val nAnchors = 2 + rnd.nextInt(2)
      val pat = (1 to nAnchors).map(_ => s"(?${1 + rnd.nextInt(nConds)})")
        .mkString(sepPool(rnd.nextInt(sepPool.size)))
      val p = parse(pat)
      val n = rnd.nextInt(8)
      // distinct, sorted µs timestamps (second-scale spacing)
      val ts = Seq.fill(n)(rnd.nextInt(12)).distinct.sorted
        .map(_.toLong * 1000000L).toArray
      val mask = ts.map(_ => 1 + rnd.nextInt((1 << nConds) - 1))
      val dp = matches(ts, mask, p)
      val brute = bruteMatchEnd(ts, mask, p, 0) >= 0
      assert(dp == brute, s"pattern $pat ts ${ts.toSeq} mask ${mask.toSeq}")
      val dpC = countMatches(ts, mask, p)
      val bruteC = bruteCount(ts, mask, p)
      assert(dpC == bruteC, s"count: pattern $pat ts ${ts.toSeq} mask ${mask.toSeq}")
      if (dp) checkedMatches += 1
    }
    assert(checkedMatches > 50, s"only $checkedMatches positive cases — weak corpus")
  }

  test("funnel level DP ≡ brute force on 400 random cases") {
    val rnd = new scala.util.Random(77)
    var positives = 0
    for (_ <- 1 to 400) {
      val steps = 2 + rnd.nextInt(2)
      val n = rnd.nextInt(8)
      val window = (1 + rnd.nextInt(8)).toLong * 1000000L
      val ts = Seq.fill(n)(rnd.nextInt(12)).distinct.sorted
        .map(_.toLong * 1000000L).toArray
      val mask = ts.map(_ => 1 + rnd.nextInt((1 << steps) - 1))
      val dp = FunnelAggs.funnelLevel(ts, mask, window, steps)
      val brute = bruteLevel(ts, mask, window, steps)
      assert(dp == brute,
        s"steps $steps window $window ts ${ts.toSeq} mask ${mask.toSeq}: dp $dp brute $brute")
      if (dp == steps) positives += 1
    }
    assert(positives > 30, s"only $positives full-level cases — weak corpus")
  }
}
