package graft

import org.scalatest.funsuite.AnyFunSuite

/** Law for the bench mover rule (VERDICT r12 item 1a — the rc=124 root
  * cause): the r11/r12 rule compared medians to the committed
  * baseline's ABSOLUTE seconds, so a box uniformly 1.36× the baseline
  * box pushed 203/238 queries over the 1.5× line and the re-time storm
  * (~114 forks × ~30 s boot) blew the driver's kill budget two rounds
  * running. The fixed rule must (1) flag NOTHING on a uniformly
  * slower/faster box, (2) still flag a genuinely moved query on that
  * same box, and (3) not let jitter on micro-queries through. */
class BenchRulesSpec extends AnyFunSuite {

  /** A surface shaped like the real one: seconds spread over two orders
    * of magnitude, deterministic pseudo-jitter. */
  private val baseline: Seq[(String, Double)] =
    (1 to 60).map(i => f"q$i%02d" -> (0.1 + (i % 17) * 0.45))

  test("uniformly slower box: factor is measured, zero movers flagged") {
    // every query 1.36x its baseline (the judge's measured machine
    // ratio) plus ±4% deterministic jitter
    val current = baseline.map { case (n, b) =>
      n -> b * 1.36 * (1.0 + 0.04 * math.sin(n.hashCode))
    }
    val ref = baseline.toMap
    val f = BenchRules.machineFactor(current, ref)
    assert(math.abs(f - 1.36) < 0.06, s"factor $f should estimate 1.36")
    val movers = current.filter { case (n, med) =>
      ref.get(n).exists(BenchRules.moved(med, _, f))
    }
    assert(movers.isEmpty,
      s"a uniformly slow box must flag nothing, got ${movers.map(_._1)}")
  }

  test("a genuinely moved query is still flagged on the slower box") {
    val current = baseline.map { case (n, b) =>
      val drift = if (n == "q07") 4.0 else 1.0 // q07 regressed 4x for real
      n -> b * 1.36 * drift
    }
    val ref = baseline.toMap
    val f = BenchRules.machineFactor(current, ref)
    val movers = current.filter { case (n, med) =>
      ref.get(n).exists(BenchRules.moved(med, _, f))
    }.map(_._1)
    assert(movers == Seq("q07"), s"exactly the real mover, got $movers")
  }

  test("identical boxes: factor 1, only the real mover flags, both directions") {
    val current = baseline.map { case (n, b) =>
      n -> (if (n == "q05") b * 2.0 else if (n == "q09") b / 2.0 else b)
    }
    val ref = baseline.toMap
    val f = BenchRules.machineFactor(current, ref)
    assert(math.abs(f - 1.0) < 0.01)
    val movers = current.filter { case (n, med) =>
      ref.get(n).exists(BenchRules.moved(med, _, f))
    }.map(_._1)
    assert(movers == Seq("q05", "q09"), s"got $movers")
  }

  test("micro-query jitter stays quiet; sparse overlap means factor 1") {
    // 30ms -> 10ms is 3x but under the 50ms absolute floor
    assert(!BenchRules.moved(0.03, 0.01, 1.0))
    assert(!BenchRules.moved(0.01, 0.03, 1.0))
    // fewer than 8 comparable queries -> no machine-factor evidence
    val tiny = Seq("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)
    assert(BenchRules.machineFactor(tiny, tiny.map { case (n, v) => n -> v * 2 }.toMap) == 1.0)
    // negative (failed) reference never flags
    assert(!BenchRules.moved(5.0, -1.0, 1.0))
  }
}
