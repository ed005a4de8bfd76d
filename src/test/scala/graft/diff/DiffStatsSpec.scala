package graft.diff

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.stats.Stats
import graft.genrule.{ColumnStats, TableStats}

class DiffStatsSpec extends SparkSpec {
  import spark.implicits._

  private def side(rows: Seq[(String, Int, String, Long, String)]) =
    rows.toDF("queryId", "returnRows", "returnRowsHash", "durationMs", "err")

  test("diff rules: err/rows/hash/duration/presence classification") {
    val r1 = side(Seq(
      ("a", 1, "h1", 10L, ""), ("b", 2, "h2", 10L, ""),
      ("c", 3, "h3", 10L, "boom"), ("d", 4, "h4", 10L, ""),
      ("left", 0, "x", 0L, "")))
    val r2 = side(Seq(
      ("a", 1, "h1", 50L, ""),            // clean (50-10 < 100)
      ("b", 9, "h2", 10L, ""),            // rows mismatch
      ("c", 3, "h3", 300L, ""),           // err mismatch + duration regression
      ("d", 4, "HX", 10L, ""),            // hash mismatch
      ("right", 0, "y", 0L, "")))
    val d = Diff.compare(r1, r2).collect().map(r =>
      r.getAs[String]("queryId") -> r).toMap
    assert(d("a").getAs[String]("presence") == "both")
    assert(!d("a").getAs[Boolean]("duration_regressed"))
    assert(d("b").getAs[Boolean]("rows_mismatch"))
    assert(d("c").getAs[Boolean]("err_mismatch") && d("c").getAs[Boolean]("duration_regressed"))
    assert(d("d").getAs[Boolean]("hash_mismatch"))
    assert(d("left").getAs[String]("presence") == "left_only")
    assert(d("right").getAs[String]("presence") == "right_only")
    assert(Diff.report(Diff.compare(r1, r2)).count() == 5) // all but 'a'
  }

  test("diff vs dump ignores rows/hash (dump has none)") {
    val r1 = side(Seq(("a", 1, "h1", 10L, "")))
    val r2 = side(Seq(("a", 9, "zz", 10L, "")))
    val d = Diff.compare(r1, r2, vsDump = true).head()
    assert(!d.getAs[Boolean]("rows_mismatch") && !d.getAs[Boolean]("hash_mismatch"))
  }

  test("row digest: order-sensitive, shuffle-independent, maxHashRows") {
    val df = Seq((2, "b"), (1, "a"), (3, "c")).toDF("k", "v")
    val h1 = RowDigest.digest(df, Seq("k")).head().getString(0)
    val h2 = RowDigest.digest(df.repartition(7), Seq("k")).head().getString(0)
    assert(h1 == h2) // partitioning can't change the digest
    val hSwapped = RowDigest.digest(
      Seq((2, "a"), (1, "b"), (3, "c")).toDF("k", "v"), Seq("k")).head().getString(0)
    assert(h1 != hSwapped) // content/order matters
    val capped = RowDigest.digest(df, Seq("k"), maxHashRows = 2).head()
    assert(capped.getLong(1) == 2)
  }

  test("stats: one-pass values match direct computation") {
    val df = Seq(
      (1, Some("aa")), (2, Some("bbb")), (2, None), (4, Some("aa"))
    ).toDF("k", "s")
    val st = Stats.collect(df, exact = true).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(st("k").getAs[Long]("cnt") == 4 && st("k").getAs[Long]("ndv") == 3)
    assert(st("k").getAs[String]("min") == "1" && st("k").getAs[String]("max") == "4")
    assert(st("s").getAs[Long]("null_count") == 1)
    assert(st("s").getAs[Long]("ndv") == 2)
    assert(math.abs(st("s").getAs[Double]("avg_len") - (2 + 3 + 2) / 3.0) < 1e-9)
  }

  test("quantiles: pivot emits a complete non-null envelope per (column, q)") {
    // ADVICE r13: the s02 pivot would surface a missing qi slice as a
    // NULL exact_lo/exact_hi instead of a dropped row (the old triple
    // inner join's behavior). All slices exist by construction; this
    // pins that construction so a future qi-layout change fails loudly.
    val df = (1 to 500).map(i => (i.toDouble, (i * 7 % 500).toDouble))
      .toDF("a", "b")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val rows = Stats.quantiles(df, Seq("a", "b"), qs).collect()
    assert(rows.length == 2 * qs.size, s"expected ${2 * qs.size} rows, got ${rows.length}")
    rows.foreach { r =>
      for (c <- Seq("exact_pct", "approx_pct", "exact_lo", "exact_hi"))
        assert(!r.isNullAt(r.fieldIndex(c)),
          s"NULL $c for (${r.getAs[String]("column")}, q=${r.getAs[Double]("q")})")
      assert(r.getAs[Double]("exact_lo") <= r.getAs[Double]("exact_pct") &&
        r.getAs[Double]("exact_pct") <= r.getAs[Double]("exact_hi"))
    }
  }

  test("equi-width histogram: bucket bounds, counts, clamping, empty bins skipped") {
    val s = spark
    import s.implicits._
    // values 0..10: span 10, 5 buckets of width 2; 10 clamps into bucket 4
    val df = (0 to 10).map(_.toDouble).toDF("x")
    val h = graft.stats.Stats.histogram(df, Seq("x"), buckets = 5)
      .orderBy("bucket").collect()
    assert(h.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(h.map(_.getAs[Long]("cnt")).toSeq == Seq(2L, 2L, 2L, 2L, 3L))
    assert(h.head.getAs[Double]("bucket_lo") == 0.0)
    assert(h.head.getAs[Double]("bucket_hi") == 2.0)
    assert(h.last.getAs[Double]("bucket_hi") == 10.0)
    // a hole in the data leaves its bin absent, not zero
    val sparse = Seq(0.0, 9.0, 10.0).toDF("x")
    val h2 = graft.stats.Stats.histogram(sparse, Seq("x"), buckets = 5)
      .orderBy("bucket").collect()
    assert(h2.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 4L))
    assert(h2.map(_.getAs[Long]("cnt")).toSeq == Seq(1L, 2L))
  }

  test("stats.yaml round-trip preserves the reference shape") {
    val ts = TableStats("employees", 8, Seq(
      ColumnStats("department_id", count = 8, ndv = 3, nullCount = 0,
        dataSize = 32, avgSizeByte = 4, min = "10", max = "30", method = "FULL")))
    val yaml = Stats.toYaml("company", Seq(ts))
    assert(yaml.contains("db: company") && yaml.contains("row_count: 8"))
    val (db, back) = Stats.fromYaml(yaml)
    assert(db == "company")
    assert(back.head.name == "employees" && back.head.rowCount == 8)
    assert(back.head.columns.head == ts.columns.head.copy(count = 0) ||
           back.head.columns.head == ts.columns.head)
    // stats → generation rules consumption path
    val rule = graft.genrule.GenRules.columnRule(
      back.head.col("department_id"), isStringType = false, isCharType = false,
      custom = Map.empty, notNull = false)
    assert(rule("min") == "10" && rule("max") == "30")
  }

  test("corrMatrix: known correlations in one pass, all pairs emitted") {
    val s = spark
    import s.implicits._
    // y = 2x (corr exactly 1), z anti-correlated with x (corr -1),
    // w constant (corr null — zero variance)
    val df = (1 to 100).map(i =>
      (i.toDouble, 2.0 * i, 101.0 - i, 5.0)).toDF("x", "y", "z", "w")
    val m = Stats.corrMatrix(df, Seq("x", "y", "z", "w")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m.size === 6)
    assert(m(("x", "y")).getDouble(2) === 1.0)
    assert(m(("x", "z")).getDouble(2) === -1.0)
    assert(m(("y", "z")).getDouble(2) === -1.0)
    assert(m(("x", "w")).isNullAt(2)) // zero variance → corr undefined
    // covar_samp(x, 2x) = 2 * var_samp(x); var_samp(1..100) = 841.666...
    // covar is emitted as a (mantissa, exponent) pair (relative precision
    // — see corrMatrix doc comment); reconstruct and compare at the
    // 5-significant-digit grain the mantissa carries.
    val covar = m(("x", "y")).getDouble(3) * math.pow(10, m(("x", "y")).getLong(4))
    assert(math.abs(covar - 2 * 841.66667) < 0.01)
  }

  // ---- Stats.robustOutliers --------------------------------------------

  test("robustOutliers catches what a sigma-z screen hides (masking)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 99 well-behaved values plus one wild 1e9: the wild point inflates
    // stddev so much that its OWN sigma-z is ~sqrt(n)=10 > 3.5 but every
    // analyst knows the failure case generalizes (two wild points mask
    // each other); median/MAD ignores the contamination entirely
    val vals = (1 to 99).map(i => ("g", 100.0 + (i % 11))) :+ (("g", 1e9))
    val df = vals.toDF("grp", "v")
    val out = graft.stats.Stats.robustOutliers(df, "grp", "v").head()
    assert(out.getAs[Long]("n") == 100)
    assert(math.abs(out.getAs[Double]("med") - 105.0) < 1.0)
    assert(out.getAs[Long]("n_outliers") == 1, "the 1e9 point must flag")
    // a pair of mutually-masking wild points: sigma-z of each is ~0.7x
    // sqrt(n/2) BELOW the classic cut in small samples; MAD flags both
    val masked = ((1 to 20).map(i => ("m", 50.0 + (i % 5))) ++
      Seq(("m", 9e8), ("m", 1e9))).toDF("grp", "v")
    val m = graft.stats.Stats.robustOutliers(masked, "grp", "v").head()
    assert(m.getAs[Long]("n_outliers") == 2, "both wild points must flag")
    // constant group: MAD = 0 -> zero outliers by contract, no div error
    val const = (1 to 10).map(_ => ("c", 7.0)).toDF("grp", "v")
    val c = graft.stats.Stats.robustOutliers(const, "grp", "v").head()
    assert(c.getAs[Double]("mad") == 0.0 && c.getAs[Long]("n_outliers") == 0L)
  }

  // ---- Stats.bootstrapCI -----------------------------------------------

  test("bootstrapCI: interval covers the planted mean and se shrinks ~1/sqrt(n)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def frame(n: Int) = spark.range(n).select(col("id"),
      (col("id") % 100).cast("double").as("x"))
    val small = graft.stats.Stats.bootstrapCI(frame(400), "id", "x").head()
    val big = graft.stats.Stats.bootstrapCI(frame(1600), "id", "x").head()
    // population mean of id%100 over a multiple of 100 ids is exactly 49.5
    for (r <- Seq(small, big)) {
      assert(r.getAs[Double]("lo") < 49.5 && 49.5 < r.getAs[Double]("hi"),
        s"CI [${r.getAs[Double]("lo")}, ${r.getAs[Double]("hi")}] misses 49.5")
      assert(r.getAs[Long]("b") == 32)
    }
    val ratio = small.getAs[Double]("se") / big.getAs[Double]("se")
    assert(ratio > 1.3 && ratio < 3.0,
      f"se should shrink ~2x from n=400 to n=1600, got ratio $ratio%.2f")
    // deterministic: the same inputs give byte-identical intervals
    val again = graft.stats.Stats.bootstrapCI(frame(400), "id", "x").head()
    assert(again.getAs[Double]("lo") == small.getAs[Double]("lo") &&
      again.getAs[Double]("hi") == small.getAs[Double]("hi"))
  }

  test("equiHeightHistogram sketch boundaries sit inside the exact rank envelope") {
    import org.apache.spark.sql.functions._
    // skewed continuous column — the shape equi-height exists for
    val df = spark.range(20000).select(
      (pow(col("id").cast("double") / 20000.0, 3.0) * 1000.0).as("v"))
    val exact = graft.stats.Stats.equiHeightHistogram(df, Seq("v"), 8,
      exact = true)
    val approx = graft.stats.Stats.equiHeightHistogram(df, Seq("v"), 8,
      exact = false)
    // exact face: every bucket holds n/8 ± 1 rows (continuous values, no
    // ties) — the defining equal-frequency property
    val exCnts = exact.select("cnt").collect().map(_.getLong(0))
    assert(exCnts.length == 8 && exCnts.forall(c => math.abs(c - 2500L) <= 1),
      s"exact bucket masses ${exCnts.mkString(",")}")
    // sketch face: every realized bucket mass within ±2% rank error of
    // n/8 (accuracy=10000 bounds rank error at 1e-4; 2% is generous
    // slack for interpolation) — the s02 rank-envelope discipline
    val apCnts = approx.select("cnt").collect().map(_.getLong(0))
    assert(apCnts.length == 8 && apCnts.sum == 20000L)
    assert(apCnts.forall(c => math.abs(c - 2500L) <= 400),
      s"sketch bucket masses ${apCnts.mkString(",")} drifted past the envelope")
  }
}
