package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.genrule.{ColumnStats, TableStats}
import scala.jdk.CollectionConverters._

/** Column-statistics dump (SURVEY.md §2.1 S6, §2.4 A2): one aggregation
  * pass computes count/ndv/null_count/min/max/avg-len for every column —
  * the engine-side equivalent of the reference's `SHOW COLUMN STATS`
  * consumption (reference: src/db.go:356-445) — plus the `<db>.stats.yaml`
  * round-trip (reference: cmd/dump.go:321-341).
  *
  * Scale: a single full scan with partial (map-side) aggregation; `exact
  * = false` (default) uses HLL approx_count_distinct so no per-column
  * shuffle of distinct values ever happens — the right choice at 100 TB.
  * Exact mode exists for small-scale oracle comparison.
  */
object Stats {

  /** Per-column stats as a DataFrame (column, cnt, ndv, null_count,
    * min, max, avg_len).
    *
    * Approx mode (the 100 TB default) is ONE pass: HLL ndv composes with
    * the other partial aggregates, so no distinct-value shuffle exists.
    * Exact mode deliberately avoids Spark's multi-count_distinct plan —
    * n distinct aggregates in one agg trigger an Expand that multiplies
    * the scan (n+1)× before the shuffle (measured 8-11 s vs 1.8 s approx
    * on 4 lineitem columns at sf0.1). Instead: the cheap aggregates in
    * one Expand-free pass, plus a second pass exploding (column, value)
    * pairs into a two-level distinct count — two skinny shuffles that
    * partial-aggregate map-side, no row multiplication. */
  def collect(df: DataFrame, columns: Seq[String] = Nil, exact: Boolean = false): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__cnt"), // total rows (null_frequency = nulls/cnt)
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        // min/max on the TYPED column, rendered as string afterwards —
        // string-typed min would be lexicographic and wrong for numerics
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        avg(length(col(c).cast("string"))).as(s"${c}__avglen")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(col(c)).as(s"${c}__ndv")))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into one row per column
    val ndvCell = if (exact) "CAST(NULL AS BIGINT)" else "CAST(`%s__ndv` AS BIGINT)"
    val stackExpr = cols.map { c =>
      s"'$c', `${c}__cnt`, ${ndvCell.format(c)}, `${c}__nulls`, `${c}__min`, `${c}__max`, CAST(`${c}__avglen` AS DOUBLE)"
    }.mkString(", ")
    val base = wide.selectExpr(
      s"stack(${cols.size}, $stackExpr) AS (column, cnt, ndv, null_count, min, max, avg_len)")
    val result =
      if (!exact) base
      else {
        // exact ndv: string rendering is injective for the primitive
        // types stats run on, so distinct-of-strings = distinct-of-values
        val pairs = df.select(explode(array(cols.map(c =>
          struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)).as("kv"))
          .select(col("kv.column").as("column"), col("kv.v").as("v"))
          .filter(col("v").isNotNull)
        val ndv = pairs.distinct()
          .groupBy("column").agg(count(lit(1)).as("ndv_exact"))
        base.drop("ndv").join(ndv, Seq("column"), "left")
          .withColumn("ndv", coalesce(col("ndv_exact"), lit(0L)))
          .select("column", "cnt", "ndv", "null_count", "min", "max", "avg_len")
      }
    result.orderBy("column")
  }

  /** Per-column quantiles in one pass:
    * (column, q, exact_pct, approx_pct, exact_lo, exact_hi).
    *
    * `percentile_approx` is the 100 TB path — a mergeable KLL-style
    * sketch whose partials combine map-side (rank error ≤ 1/accuracy),
    * the engine-side analog of Doris PERCENTILE_APPROX. The exact
    * interpolated percentile rides along for small-scale oracle
    * comparison only (it buffers values per group — fine at sf0.01,
    * not the plan you'd run on 100 TB; flip `withExact = false` there).
    * exact_lo/exact_hi are the exact quantiles at q ∓ rankTolerance —
    * the RANK-space envelope a correct sketch must land in. (A
    * value-space bound is wrong for discrete columns: one quantization
    * step of l_discount is 10% of its range while its rank error is
    * ~1e-4.) Input columns are cast to double so both engines
    * interpolate in the same arithmetic. */
  def quantiles(df: DataFrame, columns: Seq[String],
                qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                accuracy: Int = 10000, withExact: Boolean = true,
                rankTolerance: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = df.select(explode(array(columns.map(c =>
      struct(lit(c).as("column"), col(c).cast("double").as("v"))): _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.v").as("v"))
      .filter(col("v").isNotNull)
    val qArr = array(qs.map(lit): _*)
    val k = qs.size
    val approx = pairs.groupBy("column")
      .agg(percentile_approx(col("v"), qArr, lit(accuracy)).as("approx_arr"))
      .select(col("column"), posexplode(col("approx_arr")).as(Seq("pos", "approx_pct")))
      .withColumn("q", element_at(qArr, col("pos") + 1))
    if (!withExact)
      return approx.select(col("column"), col("q"),
        lit(null).cast("double").as("exact_pct"), col("approx_pct"),
        lit(null).cast("double").as("exact_lo"),
        lit(null).cast("double").as("exact_hi"))

    // Exact quantiles by SORT, not by the built-in `percentile` aggregate
    // — that one builds a value→count hash map per group (boxed doubles;
    // measured 3.4 s on 3 lineitem columns at sf0.1 vs ~1 s for this
    // plan). Rank positions: the target quantiles plus the ±rankTolerance
    // envelope, pos = q·(n-1), linear interpolation between the floor and
    // ceil ranks — the same definition `percentile`/quantile_cont use.
    val loQs = qs.map(q => math.max(0.0, q - rankTolerance))
    val hiQs = qs.map(q => math.min(1.0, q + rankTolerance))
    val allQs = qs ++ loQs ++ hiQs
    val counts = pairs.groupBy("column").agg(count(lit(1)).as("n"))
    val targets = counts.select(col("column"), col("n"),
        posexplode(array(allQs.map(lit): _*)).as(Seq("qi", "qv")))
      .withColumn("posq", col("qv") * (col("n") - 1))
      .withColumn("lo", floor(col("posq")).cast("long"))
      .withColumn("hi", ceil(col("posq")).cast("long"))
      .withColumn("frac", col("posq") - col("lo"))
    // one pass over the ranked values picks every needed rank (lo and hi
    // roles unioned so the big side is scanned once)
    val wanted = targets.select(col("column"), col("qi"), col("frac"),
        col("lo").as("rn"), lit("lo").as("role"))
      .unionByName(targets.select(col("column"), col("qi"), col("frac"),
        col("hi").as("rn"), lit("hi").as("role")))
    val ranked = pairs.withColumn("rn",
      row_number().over(Window.partitionBy("column").orderBy("v")).cast("long") - 1)
    val picked = ranked.join(broadcast(wanted), Seq("column", "rn"))
    val ex = picked.groupBy("column", "qi").agg(
        first(col("frac")).as("frac"),
        max(when(col("role") === "lo", col("v"))).as("v_lo"),
        max(when(col("role") === "hi", col("v"))).as("v_hi"))
      .withColumn("exact", col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"))
      .select(col("column"), col("qi"), col("exact"))
    // ONE pivot pass over `ex` — qi ∈ [0,k) is the target quantile,
    // [k,2k) its lo envelope, [2k,3k) its hi, all at pos = qi mod k.
    // The three slice-frames this replaces each re-executed the whole
    // ranked-sort chain as their own join branch (nothing upstream is
    // persisted — measured 3× ~1.5 s concurrent sort stages at sf0.1).
    val exPivot = ex.groupBy(col("column"), (col("qi") % k).as("pos")).agg(
      max(when(col("qi") < k, col("exact"))).as("exact_pct"),
      max(when(col("qi") >= k && col("qi") < 2 * k, col("exact"))).as("exact_lo"),
      max(when(col("qi") >= 2 * k, col("exact"))).as("exact_hi"))
    approx.join(exPivot, Seq("column", "pos"))
      .select(col("column"), col("q"), col("exact_pct"), col("approx_pct"),
        col("exact_lo"), col("exact_hi"))
  }

  /** Equi-WIDTH per-column histograms: `buckets` fixed-width bins over
    * [min, max], one row per NON-EMPTY bin with its arithmetic bounds —
    * the deterministic cross-engine face of histogram column stats
    * (Doris's `histogram()` is equi-height; its boundaries come from a
    * quantile sketch, which is `quantiles`' territory — equi-width is
    * the variant two engines can reproduce bit-for-bit).
    *
    * Two passes: one tiny min/max aggregate per column (driver-bounded:
    * 2 doubles each), then one bucket-count aggregate over exploded
    * (column, value) pairs joined to the broadcast boundaries — both
    * partial-aggregate map-side; no distinct shuffle, no Expand. */
  def histogram(df: DataFrame, columns: Seq[String],
                buckets: Int = 8): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(explode(array(columns.map(c =>
        struct(lit(c).as("column"), col(c).cast("double").as("v"))): _*)).as("kv"))
      .select(col("kv.column").as("column"), col("kv.v").as("v"))
      .filter(col("v").isNotNull)
    // cast BEFORE aggregating: min on the native type would take the
    // LEXICOGRAPHIC min of a string column and cast it to null, surfacing
    // as the misleading all-null error below (ADVICE r5)
    val statsRow = df.agg(
      min(col(columns.head).cast("double")),
      max(col(columns.head).cast("double")) +:
        columns.tail.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double")))): _*).head()
    val bounds = columns.zipWithIndex.map { case (c, i) =>
      require(!statsRow.isNullAt(2 * i),
        s"histogram: column '$c' has no non-null numeric values " +
          "(empty, all-null, or non-numeric column)")
      val lo = statsRow.getDouble(2 * i)
      val hi = statsRow.getDouble(2 * i + 1)
      // Spark orders NaN above every double, so a single NaN poisons max
      // (and then every bucket bound); engines disagree on NaN order, so
      // fail fast instead of emitting engine-specific buckets
      require(!lo.isNaN && !hi.isNaN,
        s"histogram: column '$c' contains NaN — filter NaN rows first")
      val span = math.max(hi - lo, 1e-12)
      (c, lo, span)
    }.toDF("column", "lo", "span")
    pairs.join(broadcast(bounds), Seq("column"))
      .withColumn("bucket",
        least(floor((col("v") - col("lo")) / col("span") * lit(buckets.toDouble)),
          lit(buckets - 1.0)).cast("long"))
      .groupBy("column", "bucket", "lo", "span")
      .agg(count(lit(1)).as("cnt"))
      .select(col("column"), col("bucket"),
        (col("lo") + col("bucket").cast("double") * col("span") / buckets)
          .as("bucket_lo"),
        (col("lo") + (col("bucket") + lit(1)).cast("double") * col("span") / buckets)
          .as("bucket_hi"),
        col("cnt"))
  }

  /** Pairwise Pearson correlation + sample covariance over the given
    * numeric columns — the column-dependence face of table statistics
    * (optimizer CE and data-drift monitoring both consume it). ONE
    * aggregation pass computes all k·(k−1)/2 co-moments (each `corr`/
    * `covar_samp` is a partial-aggregating DeclarativeAggregate, so the
    * scan stays single and map-side-combined at any scale); the stack()
    * unpivot of the 1-row result into (col_a, col_b, corr, covar) rows
    * is driver-free. Rounded so cross-engine/merge-order fp noise (≥9
    * orders below the grain) can't flip a compare. */
  def corrMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- columns.indices; j <- (i + 1) until columns.size
    } yield (columns(i), columns(j))
    // corr is derived as covar_samp/(sd_a·sd_b) rather than corr():
    // identical value (the (n−1) factors cancel; correlation is scale-
    // invariant), but a zero-variance column yields NULL via try_divide
    // where ANSI-mode corr() raises DIVIDE_BY_ZERO mid-aggregate — and
    // k stddevs + k(k−1)/2 covars is fewer buffers than 2·k(k−1)/2 aggs.
    val aggs = columns.map(c => stddev_samp(col(c)).as(s"sd_$c")) ++
      pairs.map { case (a, b) => covar_samp(col(a), col(b)).as(s"cov_${a}_$b") }
    // covar is magnitude-unbounded, so it is compared at RELATIVE (6
    // significant digits) precision as a (mantissa, exponent) pair —
    // an absolute grain is fp-noise-fragile above it and ±0.0-fragile
    // below it (see graft.sqlx.Sig).
    val stacked = pairs.map { case (a, b) =>
      val cv = s"`cov_${a}_$b`"
      s"'$a', '$b', round(try_divide($cv, `sd_$a` * `sd_$b`), 6), " +
        s"${graft.sqlx.Sig.mant(cv)}, ${graft.sqlx.Sig.exp(cv)}" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr, covar_mant, covar_exp)"))
  }

  /** Mutual information between two CATEGORICAL columns — the feature-
    * association profile (which columns predict which) that histograms
    * and correlation matrices miss for non-numeric data: corr() needs
    * numbers, MI works on any discrete pair and catches non-linear
    * association.
    *
    * One contingency aggregate (a, b) → count; marginals and entropies
    * re-aggregate the CONTINGENCY TABLE (|A|·|B| rows), never the data.
    * MI = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))); NMI normalizes by √(H(a)H(b))
    * into [0,1]. Natural log on both engines.
    *
    * Returns one row: (col_a, col_b, n, h_a, h_b, mi, nmi). */
  def mutualInfo(df: DataFrame, a: String, b: String): DataFrame = {
    // The contingency table fans out SIX ways (n, ca×2, cb×2, the joined
    // MI pass); un-persisted, every branch re-runs the full data scan +
    // contingency aggregate (measured: s07 re-scanned each of its three
    // tables 6× at sf0.1). |A|·|B| skinny rows — the bounded-persist
    // class; released per query by Bench/Verify.
    val cxy = graft.operators.Broadcasts.trackedPersist(
      df.filter(col(a).isNotNull && col(b).isNotNull)
        .groupBy(col(a).as("va"), col(b).as("vb"))
        .agg(count(lit(1)).as("c")))
    val n = cxy.agg(sum(col("c")).as("n"))
    val ca = cxy.groupBy("va").agg(sum(col("c")).as("ca"))
    val cb = cxy.groupBy("vb").agg(sum(col("c")).as("cb"))
    val joined = cxy.join(ca, "va").join(cb, "vb").crossJoin(broadcast(n))
    val p = col("c").cast("double") / col("n")
    val mi = joined.agg(
      sum(p * log(col("c").cast("double") * col("n") /
        (col("ca").cast("double") * col("cb")))).as("mi"))
    val ha = ca.crossJoin(broadcast(n)).agg(
      (-sum((col("ca").cast("double") / col("n")) *
        log(col("ca").cast("double") / col("n")))).as("h_a"))
    val hb = cb.crossJoin(broadcast(n)).agg(
      (-sum((col("cb").cast("double") / col("n")) *
        log(col("cb").cast("double") / col("n")))).as("h_b"))
    n.crossJoin(ha).crossJoin(hb).crossJoin(mi)
      .select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        round(col("mi"), 6).as("mi"),
        round(when(col("h_a") > 0 && col("h_b") > 0,
          col("mi") / sqrt(col("h_a") * col("h_b"))), 6).as("nmi"))
  }

  /** Equi-HEIGHT (equal-frequency) histogram — the complement of
    * [[histogram]]'s equi-width buckets, and the shape cardinality
    * estimators prefer on skewed columns (equi-width puts 99% of a
    * power-law column in one bucket; equal-frequency boundaries track
    * the mass). Boundaries are the exact interpolated inner quantiles
    * (= DuckDB quantile_cont), rounded 1e-6 so both engines assign rows
    * to buckets with the identical cut points; bucket(x) = 1 + #{b_i <
    * x} (boundary-equal rows fall LOW, same strict compare both sides).
    *
    * Shape per column: one boundary pass — `exact = true` picks the
    * interpolated inner quantiles by SORT + rank-pick (the s02
    * discipline; the built-in `percentile` aggregate was measured 4.5 s
    * at sf0.1 and carries O(ndv) boxed hashmap state per column,
    * unbounded on continuous doubles at 100 TB), `exact = false` (the
    * 100 TB default) reads them from the mergeable approx_percentile
    * sketch with bounded rank error and O(accuracy) state — then the
    * per-column boundary arrays join back broadcast, a scan-local HOF
    * counts crossed boundaries (bounded: `buckets` compares per row),
    * and one (column, bucket) count aggregate ends the plan. TWO scans
    * total regardless of column count (the per-column formulation costs
    * 2·|columns| fact scans for identical output — at 100 TB the scan
    * count IS the cost, the SCALE.md lesson-6 trade). Returns (column,
    * bucket, lo, hi, cnt) where lo/hi are the bucket's enclosing cut
    * points (NULL at the open ends). */
  def equiHeightHistogram(df: DataFrame, columns: Seq[String],
                          buckets: Int = 8, exact: Boolean = false,
                          accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets >= 2, got $buckets")
    val pcts = (1 until buckets).map(i => i.toDouble / buckets)
    // The unpivoted pair stream is consumed ONCE per face (the approx
    // sketch aggregate, or the exact face's rank machinery — which
    // persists its own ranked frame and feeds every downstream count
    // from that cache), and the final bucket-count pass re-aggregates
    // the RAW table directly — so persisting this 3×-fact-row stream
    // would be pure overhead at any scale (re-reading three parquet
    // columns beats materializing their unpivoted copy).
    val stacked =
      df.select(expr(s"stack(${columns.length}, " +
          columns.map(c => s"'$c', cast($c as double)").mkString(", ") +
          ") as (col_name, x)"))
        .filter(col("x").isNotNull)
    // (col_name, bs: array<double>) — boundaries rounded 1e-6 so both
    // engines assign rows against identical cut points
    val bnds: DataFrame =
      if (!exact)
        stacked.groupBy("col_name").agg(
          transform(percentile_approx(col("x"),
            array(pcts.map(lit): _*), lit(accuracy)), b => round(b, 6))
            .as("bs"))
      else {
        // exact interpolated quantiles (= DuckDB quantile_cont) by sort
        // + rank-pick: pos = q·(n−1), linear interpolation between the
        // floor and ceil ranks — same definition, no per-group value
        // buffer, and the sort runs DISTRIBUTED (literal-boundary
        // global rank on (column, value), per-column rank = global −
        // column base).
        // per-column n and base come from an UNSORTED map-side count
        // aggregate, not from the ranked frame: the global rank orders
        // by (col_name, x), so column c's first rank is 1 + Σ n over
        // columns before it — a running sum over the |columns|-row
        // aggregate (bounded window). The sort pass is paid exactly
        // once, by the rank-pick join below (r9: the rank frame is no
        // longer persisted, so deriving n/base from it would have
        // re-run the sort).
        val granked = graft.operators.Ranks.globalRowNumber(
          stacked, "grk", col("col_name"), col("x"))
        val colstats = graft.operators.Ranks.groupBases(stacked, "col_name")
        val targets = colstats.select(col("col_name"), col("n"), col("base"),
            posexplode(array(pcts.map(lit): _*)).as(Seq("qi", "qv")))
          .withColumn("posq", col("qv") * (col("n") - 1))
          .withColumn("lo", floor(col("posq")).cast("long"))
          .withColumn("hi", ceil(col("posq")).cast("long"))
          .withColumn("frac", col("posq") - col("lo"))
        val wanted = targets.select(col("col_name"), col("qi"), col("frac"),
            (col("lo") + col("base")).as("grk"), lit("lo").as("role"))
          .unionByName(targets.select(col("col_name"), col("qi"), col("frac"),
            (col("hi") + col("base")).as("grk"), lit("hi").as("role")))
        granked.join(broadcast(wanted), Seq("col_name", "grk"))
          .groupBy("col_name", "qi").agg(
            first(col("frac")).as("frac"),
            max(when(col("role") === "lo", col("x"))).as("v_lo"),
            max(when(col("role") === "hi", col("x"))).as("v_hi"))
          .withColumn("b",
            round(col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"), 6))
          .groupBy("col_name").agg(
            transform(array_sort(collect_list(struct(col("qi"), col("b")))),
              s => s.getField("b")).as("bs"))
      }
    // Boundary arrays are |columns| rows of bounded METADATA — collect
    // them (the same bounded-collect class as quantile rows / centroids)
    // and compile the bucket assignment into literal comparison chains:
    // the counting pass is then ONE wide map-side aggregate over the raw
    // table — no row explosion, no shuffle of data rows, fully codegen.
    val bmap: Map[String, Seq[Double]] = bnds.collect().map(r =>
      r.getString(0) -> r.getSeq[Double](1).toSeq).toMap
    // loud, descriptive failure for a column the boundary pass produced
    // nothing for (all-null / non-numeric-string / empty) — bmap(c)
    // alone would throw a bare key-not-found at plan-build time
    columns.foreach(c => require(bmap.contains(c),
      s"column '$c' has no non-null numeric values — cannot build an " +
        "equi-height histogram over it"))
    val aggExprs = columns.flatMap { c =>
      val bs = bmap(c)
      val bucketCol = bs.foldLeft(lit(1)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1).otherwise(0)
      }
      (1 to buckets).map { k =>
        // guard on the CAST value, matching the boundary pass exactly:
        // a non-castable string (or NULL) must not be counted into
        // bucket 1 — the ranked population is the castable rows only.
        // NaN stays IN on both passes (Spark sorts and compares NaN as
        // the largest double, so it ranks last and lands in the last
        // bucket — Σ cnt = n holds).
        sum(when(col(c).cast("double").isNotNull && bucketCol === k, 1L)
          .otherwise(0L)).as(s"cnt__${c}__$k")
      }
    }
    val wide = df.agg(aggExprs.head, aggExprs.tail: _*)
    val cells = columns.flatMap { c =>
      val bs = bmap(c)
      (1 to buckets).map { k =>
        val lo = if (k > 1) s"CAST(${bs(k - 2)} AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val hi = if (k < buckets) s"CAST(${bs(k - 1)} AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"'$c', CAST($k AS BIGINT), $lo, $hi, `cnt__${c}__$k`"
      }
    }
    // empty buckets (possible under heavy ties) are dropped — the
    // equal-frequency contract reports realized masses, and a per-row
    // bucketing derivation (the oracle's) never materializes them
    wide.selectExpr(s"stack(${columns.length * buckets}, " +
        cells.mkString(", ") + ") AS (column, bucket, lo, hi, cnt)")
      .filter(col("cnt") > 0)
  }

  /** Robust per-group outlier profile by MEDIAN/MAD — the robust z-score
    * that mean/stddev screening is not: one fat-fingered 1e9 value drags
    * the mean toward itself and inflates σ enough to hide ITSELF (and
    * real outliers) from a σ-z test, while the median and the median
    * absolute deviation ignore it. z = 0.6745·(x − med)/MAD (0.6745 =
    * Φ⁻¹(3/4), which calibrates MAD to σ under normality, so zCut=3.5 is
    * the conventional Iglewicz–Hoaglin screen).
    *
    * Engine-portable by construction: the median is the exact
    * interpolated percentile (= DuckDB quantile_cont), and every derived
    * quantity is rounded to 1e-6 BEFORE the next stage (med before
    * deviations, MAD before z, z before the cut compare), so the two
    * engines' last-ulp interpolation differences cannot cascade into a
    * flipped outlier count. A constant group (MAD = 0) reports zero
    * outliers by contract rather than dividing by zero.
    *
    * Shape: two grouped sort-based aggregates (values → med; deviations
    * → MAD) + one skinny join back + one count — shuffles keyed by the
    * group column only. Exact percentile sorts within each group; at
    * 100 TB swap approx_percentile for the two medians (same plan shape,
    * bounded-error cut), the documented quantile-sketch trade.
    * Returns (group, n, med, mad, n_outliers). */
  def robustOutliers(df: DataFrame, groupCol: String, valCol: String,
                     zCut: Double = 3.5): DataFrame = {
    val v = col(valCol).cast("double")
    // base fans out to the median aggregate AND the dev join build; on a
    // spread (repartitioned) scan each un-persisted consumer re-pays the
    // whole scan+exchange as its own plan branch (the s08 ×10 regression,
    // VERDICT r13 item 2). Skinny (g, x) rows, MEMORY_AND_DISK, released
    // per query by Bench/Verify.
    val base = graft.operators.Broadcasts.trackedPersist(
      df.filter(v.isNotNull).select(col(groupCol).as("g"), v.as("x")))
    val med = base.groupBy("g")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(x, 0.5)"), 6).as("med"))
    // dev fans out to the MAD aggregate AND the final z-scan; persisted
    // so the corpus-wide base-join runs once (the persist-the-fan-out
    // discipline from the dedup family)
    val dev = base.join(med, "g")
      .withColumn("d", round(abs(col("x") - col("med")), 6))
      .transform(graft.operators.Broadcasts.trackedPersist)
    val mad = dev.groupBy("g")
      .agg(round(expr("percentile(d, 0.5)"), 6).as("mad"))
    dev.join(mad, "g")
      .withColumn("z", when(col("mad") > 0,
        round(lit(0.6745) * (col("x") - col("med")) / col("mad"), 6)))
      .groupBy("g")
      .agg(max(col("n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        coalesce(sum(when(abs(col("z")) > zCut, 1L).otherwise(0L)), lit(0L))
          .as("n_outliers"))
      .select(col("g"), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Poisson-bootstrap confidence interval for a mean — THE way to get
    * error bars on corpus metrics at scale (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google TR 2012): classic
    * resampling draws n rows WITH replacement B times (B full shuffles of
    * the corpus), while the Poisson bootstrap gives every row an
    * independent Poisson(1) replication weight per replicate — ONE scan,
    * B×n exploded rows, map-side partial aggregation, no resample
    * shuffle. Weights come from the salted id hash through the inverse
    * Poisson(1) CDF (cap 8, cumulative mass 1-3e-6), so the draw is
    * deterministic, retry-stable, and replayable by any engine — no
    * rand(). Replicate means round 1e-8 before the spread statistics
    * (the repo's ranking discipline), se = stddev_samp over the B means,
    * normal-approximation interval boot_mean ± 1.96·se.
    *
    * Returns one row: (n_rows, b, point_mean, boot_mean, se, lo, hi). */
  def bootstrapCI(df: DataFrame, idCol: String, valCol: String,
                  b: Int = 32, salt: String = "boot"): DataFrame = {
    require(b >= 8, s"b >= 8 replicates, got $b")
    // P(Poisson(1) <= k), k = 0..7
    val cum = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
    val base = df.select(col(idCol).cast("string").as("id"),
      col(valCol).cast("double").as("x")).filter(col("x").isNotNull)
    val reps = base.select(col("id"), col("x"),
      explode(sequence(lit(0), lit(b - 1))).as("rep"))
    // the salted unit hash IS Mixing.hashUnit over the "rep:id" key —
    // reuse it so the engine-portability contract (8 hex chars, 2^-32
    // quantization) lives in exactly one place
    val u = graft.pipeline.Mixing.hashUnit(
      concat(col("rep"), lit(":"), col("id")), salt)
    val w = cum.zipWithIndex.foldLeft(when(lit(false), 0)) {
      case (acc, (c, k)) => acc.when(u < c, k)
    }.otherwise(8)
    // a replicate whose Poisson weights all drew 0 has no sample — drop
    // it EXPLICITLY (sum(w)=0 would otherwise make m NaN in Spark / NULL
    // in other engines and silently bias the spread) and report the
    // REALIZED replicate count so the caller sees the effective b
    val repMeans = reps.withColumn("w", w)
      .groupBy("rep").agg(sum(col("w")).as("sw"),
        round(sum(col("w") * col("x")) / sum(col("w")), 8).as("m"))
      .filter(col("sw") > 0)
    val spread = repMeans.agg(
      count(lit(1)).as("b"),
      avg(col("m")).as("bm"), stddev_samp(col("m")).as("se_raw"))
    val point = base.agg(count(lit(1)).as("n_rows"),
      avg(col("x")).as("pm"))
    point.crossJoin(broadcast(spread))
      .select(col("n_rows"), col("b"),
        round(col("pm"), 6).as("point_mean"),
        round(col("bm"), 6).as("boot_mean"),
        round(col("se_raw"), 6).as("se"),
        round(col("bm") - lit(1.96) * col("se_raw"), 6).as("lo"),
        round(col("bm") + lit(1.96) * col("se_raw"), 6).as("hi"))
  }

  /** DataFrame → TableStats (driver-side; the stats result is tiny). */
  def toTableStats(name: String, rowCount: Long, stats: DataFrame): TableStats =
    TableStats(name, rowCount, stats.collect().toSeq.map { r =>
      ColumnStats(
        name = r.getAs[String]("column"),
        count = r.getAs[Long]("cnt"),
        ndv = r.getAs[Long]("ndv"),
        nullCount = r.getAs[Long]("null_count"),
        avgSizeByte = Option(r.getAs[Double]("avg_len")).map(_.round).getOrElse(0L),
        min = Option(r.getAs[String]("min")).getOrElse(""),
        max = Option(r.getAs[String]("max")).getOrElse(""),
        method = "FULL")
    })

  // ---- <db>.stats.yaml round-trip ------------------------------------

  /** Serialize in the reference's stats.yaml shape (FIXTURES.md §5). */
  def toYaml(db: String, tables: Seq[TableStats]): String = {
    val root = new java.util.LinkedHashMap[String, Any]()
    root.put("db", db)
    root.put("tables", tables.map { t =>
      val tm = new java.util.LinkedHashMap[String, Any]()
      tm.put("name", t.name)
      tm.put("row_count", t.rowCount)
      tm.put("columns", t.columns.map { c =>
        val cm = new java.util.LinkedHashMap[String, Any]()
        cm.put("name", c.name)
        cm.put("ndv", c.ndv)
        cm.put("null_count", c.nullCount)
        cm.put("data_size", c.dataSize)
        cm.put("avg_size_byte", c.avgSizeByte)
        cm.put("min", c.min)
        cm.put("max", c.max)
        cm.put("method", c.method)
        cm
      }.asJava)
      tm
    }.asJava)
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(root)
  }

  def fromYaml(yaml: String): (String, Seq[TableStats]) = {
    val root = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](yaml)
    val db = Option(root.get("db")).map(_.toString).getOrElse("")
    def longOf(m: java.util.Map[String, Any], k: String): Long =
      Option(m.get(k)).map(_.toString.toDouble.toLong).getOrElse(0L)
    def strOf(m: java.util.Map[String, Any], k: String): String =
      Option(m.get(k)).map(_.toString).getOrElse("")
    val tables = Option(root.get("tables")).map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala.toSeq)
      .getOrElse(Nil).map { tm =>
        val cols = Option(tm.get("columns")).map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]].asScala.toSeq)
          .getOrElse(Nil).map { cm =>
            ColumnStats(
              name = strOf(cm, "name"), count = longOf(cm, "count"),
              ndv = longOf(cm, "ndv"), nullCount = longOf(cm, "null_count"),
              dataSize = longOf(cm, "data_size"), avgSizeByte = longOf(cm, "avg_size_byte"),
              min = strOf(cm, "min"), max = strOf(cm, "max"), method = strOf(cm, "method"))
          }
        TableStats(strOf(tm, "name"), longOf(tm, "row_count"), cols)
      }
    (db, tables)
  }
}
