package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.diff.{Diff, RowDigest}
import graft.stats.Stats

/** Diff, row-digest and stats operators as driver-checkable queries
  * (SURVEY.md J1/D1/D2/A3 and S6/A2). The synthetic replay-result sides
  * are derived deterministically from the sf tables so the DuckDB oracle
  * can rebuild both sides and re-implement the rule logic independently.
  */
object DiffStatsQueries extends QueryModule {

  private def resultSide(s: SparkSession, right: Boolean): DataFrame = {
    // Deterministic ReplayResult-shaped rows from `orders`; the right side
    // perturbs rows/hash/err/duration on co-prime key slices.
    val base =
      if (!right) s.sql("""
        SELECT CONCAT('q', CAST(o_orderkey AS STRING)) AS queryId,
               CAST(o_orderkey % 5 AS INT) AS returnRows,
               CAST(o_orderkey % 7 AS STRING) AS returnRowsHash,
               CAST(o_orderkey % 100 AS BIGINT) AS durationMs,
               CASE WHEN o_orderkey % 13 = 0 THEN 'boom' ELSE '' END AS err
        FROM orders WHERE o_orderkey <= 5000""")
      else s.sql("""
        SELECT CONCAT('q', CAST(o_orderkey AS STRING)) AS queryId,
               CAST(o_orderkey % 5 + (CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END) AS INT) AS returnRows,
               CAST((CASE WHEN o_orderkey % 19 = 0 THEN o_orderkey % 7 + 1 ELSE o_orderkey % 7 END) AS STRING) AS returnRowsHash,
               CAST(o_orderkey % 100 + (CASE WHEN o_orderkey % 23 = 0 THEN 200 ELSE 0 END) AS BIGINT) AS durationMs,
               CASE WHEN o_orderkey % 13 = 0 THEN 'boom'
                    WHEN o_orderkey % 29 = 0 THEN 'late' ELSE '' END AS err
        FROM orders WHERE o_orderkey > 50 AND o_orderkey <= 5500""")
    base
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D1: diff two replay-result sets -------------------------------
    "d01_diff_replays" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val diffed = Diff.compare(resultSide(s, right = false), resultSide(s, right = true))
      diffed.groupBy("presence", "err_mismatch", "rows_mismatch",
                     "hash_mismatch", "duration_regressed")
        .agg(count(lit(1)).as("n"))
        .orderBy("presence", "err_mismatch", "rows_mismatch",
                 "hash_mismatch", "duration_regressed")
    }),

    // ---- A3: order-sensitive row digest --------------------------------
    "d02_row_digest" -> ((s, dir) => {
      val li = Tables.t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      RowDigest.digest(li, Seq("l_orderkey", "l_linenumber"))
    }),

    // ---- S6/A2: one-pass column stats over lineitem --------------------
    "s01_column_stats" -> ((s, dir) => {
      // project to the profiled columns BEFORE the spread exchange (guide
      // §2.3) and persist: exact mode consumes the scan twice (wide agg +
      // the ndv pair explode), and an un-persisted spread frame re-pays
      // scan+exchange per consumer (VERDICT r13 item 2). Released per
      // query by Bench/Verify.
      val cols = Seq("l_orderkey", "l_returnflag", "l_quantity", "l_shipdate")
      val li = graft.operators.Broadcasts.trackedPersist(
        Tables.spread(Tables.t(s, dir, "lineitem").select(cols.map(col): _*)))
      Stats.collect(li, cols, exact = true)
    }),

    // ---- quantile stats: percentile_approx is the mergeable-sketch
    //      100 TB path (map-side partials, rank error ≤ 1/accuracy); the
    //      exact interpolated percentile is cross-engine-compared and an
    //      in-query guard pins the sketch inside the RANK envelope
    //      [exact(q-1%), exact(q+1%)] — rank-space, because value-space
    //      bounds are meaningless for discrete columns like l_discount -
    "s02_quantile_stats" -> ((s, dir) => {
      // 3-col projection + persist: quantiles consumes the pair stream
      // three ways (approx sketch, counts, the ranked sort) — see s01
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = graft.operators.Broadcasts.trackedPersist(
        Tables.spread(Tables.t(s, dir, "lineitem").select(cols.map(col): _*)))
      // the result is 12 rows: collect ONCE, guard on the driver, and
      // return a local frame — a .count() guard would re-execute the
      // whole aggregation for the write
      val rows = Stats.quantiles(li, cols)
        .withColumn("approx_ok",
          col("approx_pct") >= col("exact_lo") && col("approx_pct") <= col("exact_hi"))
        .select(col("column"), col("q"),
          round(col("exact_pct"), 6).as("exact_pct"), col("approx_ok"))
        .orderBy("column", "q")
        .collect()
      val bad = rows.count(!_.getBoolean(3))
      require(bad == 0, s"quantile sketch regression: $bad estimates out of rank envelope")
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("column", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("exact_pct", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("approx_ok", org.apache.spark.sql.types.BooleanType))))
        .orderBy("column", "q")
    }),

    // ---- equi-width column histograms: the deterministic cross-engine
    //      face of histogram column stats (bounds and bucket assignment
    //      are pure double arithmetic both engines restate verbatim;
    //      equi-HEIGHT boundaries are s02's quantile-sketch territory) -
    "s03_histogram" -> ((s, dir) => {
      // 2 consumers (min/max head + the bucket-count pass) — see s01
      val hcols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = graft.operators.Broadcasts.trackedPersist(
        Tables.spread(Tables.t(s, dir, "lineitem").select(hcols.map(col): _*)))
      Stats.histogram(li, hcols, 8)
        .select(col("column"), col("bucket"),
          round(col("bucket_lo"), 6).as("bucket_lo"),
          round(col("bucket_hi"), 6).as("bucket_hi"), col("cnt"))
        .orderBy("column", "bucket")
    }),

    // ---- pairwise correlation/covariance stats: all 6 co-moments of 4
    //      lineitem numerics in ONE partial-aggregating scan, unpivoted
    //      to rows with stack() (no driver collect) ----------------------
    // ---- categorical frequent-values profile: top-3 values per string
    //      column (the histogram complement for non-numeric columns —
    //      optimizer CE and drift monitors both consume most-common-
    //      value lists). One skinny groupBy per column, rank ties broken
    //      on the value string so any engine draws the same top-3 ------
    "s06_frequent_values" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cols = Seq(
        ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
        ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
        ("customer", "c_mktsegment"))
      cols.map { case (tbl, c) =>
        Tables.spread(Tables.t(s, dir, tbl)).groupBy(col(c).as("value"))
          .agg(count(lit(1)).as("cnt"))
          .select(lit(tbl).as("tbl"), lit(c).as("column"),
            col("value"), col("cnt"))
      }.reduce(_ unionByName _)
        .withColumn("rk", row_number().over(
          Window.partitionBy("tbl", "column")
            .orderBy(col("cnt").desc, col("value"))).cast("long"))
        .filter(col("rk") <= 3)
        .orderBy("tbl", "column", "rk")
    }),

    "s04_numeric_corr" -> ((s, dir) => {
      val li = Tables.spread(Tables.t(s, dir, "lineitem"))
      Stats.corrMatrix(li,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")
    }),

    // ---- per-group EXACT quantiles (the per-language length profile a
    //      mixture recipe reads): one partial-aggregating scan; exact
    //      percentile state is a value→count map, memory ∝ DISTINCT
    //      values per group — right for bounded domains like doc length;
    //      s02's sketch path is the unbounded-domain alternative. Both
    //      engines interpolate linearly; 1e-6 rounding absorbs the
    //      a+(b−a)·f vs (1−f)·a+f·b ulp split -------------------------
    "s05_group_quantiles" -> ((s, dir) => {
      Tables.spread(Tables.t(s, dir, "documents"))
        .groupBy(col("lang"))
        .agg(
          round(expr("percentile(n_chars, 0.25D)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5D)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.9D)"), 6).as("p90"),
          count(lit(1)).as("n_docs"))
        .orderBy("lang")
    }),

    // ---- categorical mutual information / NMI profile: the association
    //      measure corr() can't give for non-numeric pairs. One
    //      contingency aggregate per pair; entropies and MI re-aggregate
    //      the |A|·|B|-row table, never the data --------------------------
    "s07_mutual_info" -> ((s, dir) => {
      Seq(
        ("orders", "o_orderstatus", "o_orderpriority"),
        ("lineitem", "l_returnflag", "l_linestatus"),
        ("customer", "c_mktsegment", "c_nationkey"))
        .map { case (tbl, a, b) =>
          graft.stats.Stats.mutualInfo(
            Tables.spread(Tables.t(s, dir, tbl)).withColumn(b, col(b).cast("string")), a, b)
            .withColumn("tbl", lit(tbl))
        }
        .reduce(_ unionByName _)
        .select("tbl", "col_a", "col_b", "n", "h_a", "h_b", "mi", "nmi")
        .orderBy("tbl", "col_a")
    }),

    // ---- robust per-group outlier screen (median/MAD z, the Iglewicz–
    //      Hoaglin 3.5 cut): the data-quality gate mean/stddev cannot be
    //      (a wild value inflates sigma enough to hide itself). Exact
    //      interpolated medians = DuckDB quantile_cont; every derived
    //      stage rounds 1e-6 before the next so engines cannot drift ----
    "s08_robust_outliers" -> ((s, dir) => {
      Seq(("documents", "lang", "n_chars"),
        ("lineitem", "l_returnflag", "l_extendedprice"))
        .map { case (tbl, g, v) =>
          graft.stats.Stats.robustOutliers(Tables.spread(Tables.t(s, dir, tbl)), g, v)
            .withColumn("tbl", lit(tbl))
        }
        .reduce(_ unionByName _)
        .select("tbl", "g", "n", "med", "mad", "n_outliers")
        .orderBy("tbl", "g")
    }),

    // ---- Poisson-bootstrap CI for a corpus mean (Chamandy et al.):
    //      deterministic hash-driven Poisson(1) replication weights, ONE
    //      scan + B exploded replicates, map-side partials — the error
    //      bar every corpus metric should carry; both engines re-derive
    //      the identical weights from the salted id hash ---------------
    "s10_bootstrap_ci" -> ((s, dir) =>
      graft.stats.Stats.bootstrapCI(
        Tables.spread(Tables.t(s, dir, "documents")), "doc_id", "n_chars")),

    // ---- equi-HEIGHT histogram: equal-frequency buckets from exact
    //      interpolated inner quantiles (s03 is the equi-width face);
    //      the CE shape for skewed columns. Boundaries rounded 1e-6,
    //      boundary-equal rows fall low on both engines ----------------
    "s09_equiheight_histogram" -> ((s, dir) => {
      // exact = true is the ORACLE face (sort + rank-pick quantiles,
      // = DuckDB quantile_cont); exact = false is the 100 TB default
      // (approx_percentile sketch boundaries) — StatsSpec pins the
      // sketch boundaries inside the exact rank envelope
      // 3-col projection + persist: the exact face consumes the spread
      // scan three ways (rank sort, group bases, the bucket-count wide
      // agg) — the s09 ×10 regression of VERDICT r13 item 2
      val hcols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val li = graft.operators.Broadcasts.trackedPersist(
        Tables.spread(Tables.t(s, dir, "lineitem").select(hcols.map(col): _*)))
      graft.stats.Stats.equiHeightHistogram(li, hcols, 8, exact = true)
        .orderBy("column", "bucket")
    }),

    // ---- KLL quantile sketch with group→corpus ROLLUP: per-group
    //      sketches, then the corpus sketch merged from the group
    //      sketch BINARIES alone (graft_kll_merge — no second data
    //      pass), the composability approx_percentile never exposes.
    //      Estimates are pinned inside the exact rank envelope at 2×
    //      the k=200 normalized rank error; the emitted values are the
    //      EXACT interpolated quantiles (= DuckDB quantile_cont), so
    //      the oracle face is deterministic while the sketch path is
    //      exercised end-to-end. Exact face = distributed range-
    //      partition rank (Ranks.globalRowNumber), never a boxed
    //      percentile map or single-partition sort --------------------
    "s11_kll_quantiles" -> ((s, dir) => {
      graft.functions.KllAgg.register(s)
      val qs = Seq(0.25, 0.5, 0.75, 0.95)
      val k = 200
      val tol = 2.0 * graft.functions.Kll.rankError(k)
      // persisted: grouped fans out to the sketch aggregate AND both
      // legs of the exact-face union (rank sort + group bases) — an
      // un-persisted spread frame re-pays scan+exchange per branch
      // (the s11 share of VERDICT r13 item 2)
      val grouped = graft.operators.Broadcasts.trackedPersist(
        Tables.spread(Tables.t(s, dir, "lineitem")
            .select("l_returnflag", "l_extendedprice"))
          .select(col("l_returnflag").as("g"),
            col("l_extendedprice").cast("double").as("v"))
          .filter(col("v").isNotNull))
      // 'ALL' rides the same pipeline as the groups: one union, one
      // range-partition sort, one code path for both faces
      val vals = grouped.unionByName(
        grouped.select(lit("ALL").as("g"), col("v")))
      val qArr = array(qs.map(lit): _*)
      // sketch face: per-group sketches; corpus sketch = merge of the
      // group sketch binaries (never sees a data row)
      val grpSk = grouped.groupBy("g")
        .agg(expr(s"graft_kll(v, $k)").as("sk"))
      val allSk = grpSk.agg(expr(s"graft_kll_merge(sk, $k)").as("sk"))
        .select(lit("ALL").as("g"), col("sk"))
      val ests = grpSk.unionByName(allSk)
        .select(col("g"), posexplode(
          expr(s"graft_kll_quantiles(sk, array(${qs.mkString("D,")}D))"))
          .as(Seq("pos", "est")))
      // exact face: global rank over (g, v) — ties permute only equal
      // values, so the value AT a rank is deterministic
      val ranked = graft.operators.Ranks.globalRowNumber(
        vals, "grn", col("g"), col("v"))
      // per-group n and first-rank base come from an UNSORTED count
      // aggregate + a |groups|-row running sum (the rank orders by
      // (g, v), so group g starts at 1 + Σ earlier groups' n) — reading
      // them off `ranked` would re-run the sort per consumer now that
      // Ranks no longer persists its output
      val gstats = graft.operators.Ranks.groupBases(vals, "g", baseCol = "g0")
      // bounded target table: per (g, q) the interpolation floor/ceil
      // ranks plus the ±tol envelope ranks (0-based within the group)
      val targets = gstats
        .select(col("g"), col("g0"), col("n"),
          posexplode(qArr).as(Seq("pos", "q")))
        .withColumn("pq", col("q") * (col("n") - 1))
        .withColumn("frac", col("pq") - floor(col("pq")))
        .withColumn("r_lo", floor(col("pq")).cast("long"))
        .withColumn("r_hi", ceil(col("pq")).cast("long"))
        .withColumn("r_elo",
          greatest(lit(0L), floor((col("q") - lit(tol)) * (col("n") - 1)).cast("long")))
        .withColumn("r_ehi",
          least(col("n") - 1, ceil((col("q") + lit(tol)) * (col("n") - 1)).cast("long")))
      val wanted = Seq(("r_lo", "lo"), ("r_hi", "hi"), ("r_elo", "elo"), ("r_ehi", "ehi"))
        .map { case (rc, role) =>
          targets.select(col("g"), col("pos"), col("q"), col("frac"), col("n"),
            (col("g0") + col(rc)).as("grn"), lit(role).as("role"))
        }.reduce(_ unionByName _)
      val picked = ranked.join(broadcast(wanted), Seq("g", "grn"))
        .groupBy("g", "pos").agg(
          first(col("q")).as("q"), first(col("frac")).as("frac"),
          first(col("n")).as("n"),
          max(when(col("role") === "lo", col("v"))).as("v_lo"),
          max(when(col("role") === "hi", col("v"))).as("v_hi"),
          max(when(col("role") === "elo", col("v"))).as("env_lo"),
          max(when(col("role") === "ehi", col("v"))).as("env_hi"))
        .withColumn("exact_pct",
          col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"))
      val rows = picked.join(ests, Seq("g", "pos"))
        .withColumn("approx_ok",
          col("est") >= col("env_lo") && col("est") <= col("env_hi"))
        .select(col("g"), col("q"), round(col("exact_pct"), 6).as("exact_pct"),
          col("n"), col("approx_ok"))
        .orderBy("g", "q")
        .collect()
      val bad = rows.count(!_.getBoolean(4))
      require(bad == 0,
        s"KLL sketch regression: $bad estimates outside the ±$tol rank envelope")
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("q", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("exact_pct", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("approx_ok", org.apache.spark.sql.types.BooleanType))))
        .orderBy("g", "q")
    })
  )

  val oracles: Map[String, String] = Map(
    "d01_diff_replays" -> """
      WITH r1 AS (
        SELECT CONCAT('q', CAST(o_orderkey AS VARCHAR)) AS queryId,
               CAST(o_orderkey % 5 AS INT) AS rrows,
               CAST(o_orderkey % 7 AS VARCHAR) AS rhash,
               CAST(o_orderkey % 100 AS BIGINT) AS ms,
               CASE WHEN o_orderkey % 13 = 0 THEN 'boom' ELSE '' END AS err
        FROM orders WHERE o_orderkey <= 5000),
      r2 AS (
        SELECT CONCAT('q', CAST(o_orderkey AS VARCHAR)) AS queryId,
               CAST(o_orderkey % 5 + (CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END) AS INT) AS rrows,
               CAST((CASE WHEN o_orderkey % 19 = 0 THEN o_orderkey % 7 + 1 ELSE o_orderkey % 7 END) AS VARCHAR) AS rhash,
               CAST(o_orderkey % 100 + (CASE WHEN o_orderkey % 23 = 0 THEN 200 ELSE 0 END) AS BIGINT) AS ms,
               CASE WHEN o_orderkey % 13 = 0 THEN 'boom'
                    WHEN o_orderkey % 29 = 0 THEN 'late' ELSE '' END AS err
        FROM orders WHERE o_orderkey > 50 AND o_orderkey <= 5500),
      joined AS (
        SELECT COALESCE(r1.queryId, r2.queryId) AS queryId,
               CASE WHEN r1.queryId IS NOT NULL AND r2.queryId IS NOT NULL THEN 'both'
                    WHEN r1.queryId IS NOT NULL THEN 'left_only'
                    ELSE 'right_only' END AS presence,
               (r1.queryId IS NOT NULL AND r2.queryId IS NOT NULL AND r1.err <> r2.err) AS err_mismatch,
               (r1.queryId IS NOT NULL AND r2.queryId IS NOT NULL AND r1.rrows <> r2.rrows) AS rows_mismatch,
               (r1.queryId IS NOT NULL AND r2.queryId IS NOT NULL AND r1.rhash <> r2.rhash) AS hash_mismatch,
               (r1.queryId IS NOT NULL AND r2.queryId IS NOT NULL AND r2.ms - r1.ms > 100) AS duration_regressed
        FROM r1 FULL OUTER JOIN r2 ON r1.queryId = r2.queryId)
      SELECT presence, err_mismatch, rows_mismatch, hash_mismatch,
             duration_regressed, COUNT(*) AS n
      FROM joined
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY 1, 2, 3, 4, 5""",

    "d02_row_digest" -> """
      SELECT sha256(COALESCE(string_agg(line || chr(10), '' ORDER BY l_orderkey, l_linenumber, line), '')) AS rows_hash,
             COUNT(*) AS n_rows
      FROM (
        SELECT l_orderkey, l_linenumber,
               concat_ws(chr(9), CAST(l_orderkey AS VARCHAR),
                         CAST(l_linenumber AS VARCHAR),
                         CAST(l_quantity AS VARCHAR)) AS line
        FROM lineitem WHERE l_orderkey <= 500)""",

    "s01_column_stats" -> """
      SELECT * FROM (
        SELECT 'l_orderkey' AS "column", COUNT(*) AS cnt,
               COUNT(DISTINCT l_orderkey) AS ndv,
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
               CAST(MIN(l_orderkey) AS VARCHAR) AS min, CAST(MAX(l_orderkey) AS VARCHAR) AS max,
               AVG(LENGTH(CAST(l_orderkey AS VARCHAR))) AS avg_len
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', COUNT(*), COUNT(DISTINCT l_quantity),
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR),
               AVG(LENGTH(CAST(l_quantity AS VARCHAR)))
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*), COUNT(DISTINCT l_returnflag),
               CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR),
               AVG(LENGTH(CAST(l_returnflag AS VARCHAR)))
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', COUNT(*), COUNT(DISTINCT l_shipdate),
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR),
               AVG(LENGTH(CAST(l_shipdate AS VARCHAR)))
        FROM lineitem) t
      ORDER BY "column"""",

    "s02_quantile_stats" -> """
      WITH v AS (
        SELECT 'l_quantity' AS c, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem),
      qq AS (
        SELECT c, quantile_cont(v, [0.25, 0.5, 0.75, 0.95]) AS qs
        FROM v GROUP BY c)
      SELECT c AS "column",
             CAST(([0.25, 0.5, 0.75, 0.95])[i] AS DOUBLE) AS q,
             round(qs[i], 6) AS exact_pct,
             TRUE AS approx_ok
      FROM qq CROSS JOIN (VALUES (1), (2), (3), (4)) t(i)
      ORDER BY "column", q""",

    "s03_histogram" -> """
      WITH v AS (
        SELECT 'l_quantity' AS c, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem),
      st AS (
        SELECT c, CAST(min(v) AS DOUBLE) AS lo,
               greatest(CAST(max(v) AS DOUBLE) - CAST(min(v) AS DOUBLE), 1e-12) AS span
        FROM v GROUP BY c),
      b AS (
        SELECT v.c,
               CAST(least(floor((v.v - st.lo) / st.span * 8.0), 7.0) AS BIGINT) AS bucket,
               st.lo, st.span
        FROM v JOIN st ON v.c = st.c)
      SELECT c AS "column", bucket,
             round(lo + CAST(bucket AS DOUBLE) * span / 8, 6) AS bucket_lo,
             round(lo + CAST(bucket + 1 AS DOUBLE) * span / 8, 6) AS bucket_hi,
             COUNT(*) AS cnt
      FROM b GROUP BY c, bucket, lo, span
      ORDER BY "column", bucket""",

    "s06_frequent_values" -> {
      val cols = Seq(
        ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
        ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
        ("customer", "c_mktsegment"))
      cols.map { case (tbl, c) =>
        s"""SELECT '$tbl' AS tbl, '$c' AS "column", $c AS value,
           |       CAST(COUNT(*) AS BIGINT) AS cnt
           |FROM $tbl GROUP BY $c""".stripMargin
      }.mkString(
        "WITH u AS (\n", "\nUNION ALL\n", s"""
        |)
        |SELECT tbl, "column", value, cnt,
        |       CAST(row_number() OVER (PARTITION BY tbl, "column"
        |              ORDER BY cnt DESC, value) AS BIGINT) AS rk
        |FROM u
        |QUALIFY rk <= 3
        |ORDER BY tbl, "column", rk""".stripMargin)
    },

    "s04_numeric_corr" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield (cols(i), cols(j))
      // covar is magnitude-unbounded, so it's compared as a (mantissa,
      // exponent) pair at relative precision — the SAME Sig SQL text the
      // Spark side embeds (see graft.sqlx.Sig), so the engines can't drift.
      pairs.map { case (a, b) =>
        val cv = s"covar_samp($a, $b)"
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |       round(corr($a, $b), 6) AS corr,
           |       ${graft.sqlx.Sig.mant(cv)} AS covar_mant,
           |       ${graft.sqlx.Sig.exp(cv)} AS covar_exp FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    "s05_group_quantiles" -> """
      SELECT lang,
             round(quantile_cont(n_chars, 0.25), 6) AS p25,
             round(quantile_cont(n_chars, 0.5), 6) AS p50,
             round(quantile_cont(n_chars, 0.9), 6) AS p90,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang""",

    "s07_mutual_info" -> {
      def pairSql(tbl: String, a: String, b: String): String = s"""
        SELECT '$tbl' AS tbl, '$a' AS col_a, '$b' AS col_b, n, h_a, h_b, mi, nmi
        FROM (
          WITH cxy AS (
            SELECT $a AS va, CAST($b AS VARCHAR) AS vb, COUNT(*) AS c
            FROM $tbl WHERE $a IS NOT NULL AND $b IS NOT NULL
            GROUP BY 1, 2),
          nn AS (SELECT SUM(c) AS n FROM cxy),
          ca AS (SELECT va, SUM(c) AS ca FROM cxy GROUP BY va),
          cb AS (SELECT vb, SUM(c) AS cb FROM cxy GROUP BY vb),
          mi0 AS (
            SELECT SUM((CAST(c AS DOUBLE) / nn.n) *
                       ln(CAST(c AS DOUBLE) * nn.n /
                          (CAST(ca.ca AS DOUBLE) * cb.cb))) AS mi
            FROM cxy JOIN ca USING (va) JOIN cb USING (vb) CROSS JOIN nn),
          ha0 AS (SELECT -SUM((CAST(ca AS DOUBLE) / nn.n) *
                              ln(CAST(ca AS DOUBLE) / nn.n)) AS h_a
                  FROM ca CROSS JOIN nn),
          hb0 AS (SELECT -SUM((CAST(cb AS DOUBLE) / nn.n) *
                              ln(CAST(cb AS DOUBLE) / nn.n)) AS h_b
                  FROM cb CROSS JOIN nn)
          SELECT CAST(nn.n AS BIGINT) AS n,
                 round(h_a, 6) AS h_a, round(h_b, 6) AS h_b,
                 round(mi, 6) AS mi,
                 round(CASE WHEN h_a > 0 AND h_b > 0
                            THEN mi / sqrt(h_a * h_b) END, 6) AS nmi
          FROM nn CROSS JOIN ha0 CROSS JOIN hb0 CROSS JOIN mi0)"""
      Seq(("orders", "o_orderstatus", "o_orderpriority"),
        ("lineitem", "l_returnflag", "l_linestatus"),
        ("customer", "c_mktsegment", "c_nationkey"))
        .map { case (t, a, b) => pairSql(t, a, b) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col_a")
    },

    "s08_robust_outliers" -> {
      def grpSql(tbl: String, g: String, v: String): String = s"""
        SELECT '$tbl' AS tbl, g, n, med, mad, n_outliers FROM (
          WITH base AS (
            SELECT $g AS g, CAST($v AS DOUBLE) AS x
            FROM $tbl WHERE $v IS NOT NULL),
          med AS (SELECT g, COUNT(*) AS n,
                    round(quantile_cont(x, 0.5), 6) AS med
                  FROM base GROUP BY g),
          dev AS (SELECT base.g, x, n, med, round(abs(x - med), 6) AS d
                  FROM base JOIN med USING (g)),
          mad AS (SELECT g, round(quantile_cont(d, 0.5), 6) AS mad
                  FROM dev GROUP BY g)
          SELECT dev.g, CAST(MAX(n) AS BIGINT) AS n,
                 MAX(med) AS med, MAX(mad) AS mad,
                 CAST(COALESCE(SUM(CASE WHEN mad > 0 AND
                     abs(round(0.6745 * (x - med) / mad, 6)) > 3.5
                   THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
          FROM dev JOIN mad USING (g) GROUP BY dev.g)"""
      Seq(("documents", "lang", "n_chars"),
        ("lineitem", "l_returnflag", "l_extendedprice"))
        .map { case (t, g, v) => grpSql(t, g, v) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, g")
    },

    "s10_bootstrap_ci" -> {
      val cum = Seq(0.36787944117144233, 0.7357588823428847,
        0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
        0.9994058151824183, 0.9999167588507119, 0.9999897508033253)
      val caseW = cum.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
      s"""
      WITH base AS (SELECT CAST(doc_id AS VARCHAR) AS id,
             CAST(n_chars AS DOUBLE) AS x
           FROM documents WHERE n_chars IS NOT NULL),
      reps AS (SELECT id, x, r.rep
               FROM base CROSS JOIN
                 (SELECT unnest(range(0, 32)) AS rep) r),
      wts AS (SELECT rep, x,
        (('0x' || substr(md5('boot:' || CAST(rep AS VARCHAR) || ':' || id),
          1, 8))::BIGINT) / 4294967296.0 AS u
        FROM reps),
      ws AS (SELECT rep, x, $caseW AS w FROM wts),
      rm AS (SELECT rep, round(SUM(w * x) / SUM(w), 8) AS m
             FROM ws GROUP BY rep HAVING SUM(w) > 0),
      sp AS (SELECT COUNT(*) AS b, AVG(m) AS bm, stddev_samp(m) AS se_raw
             FROM rm),
      pt AS (SELECT COUNT(*) AS n_rows, AVG(x) AS pm FROM base)
      SELECT CAST(n_rows AS BIGINT) AS n_rows, CAST(b AS BIGINT) AS b,
             round(pm, 6) AS point_mean, round(bm, 6) AS boot_mean,
             round(se_raw, 6) AS se,
             round(bm - 1.96 * se_raw, 6) AS lo,
             round(bm + 1.96 * se_raw, 6) AS hi
      FROM pt CROSS JOIN sp"""
    },

    "s09_equiheight_histogram" -> {
      val pcts = (1 to 7).map(i => i / 8.0).mkString(", ")
      def colSql(c: String): String = s"""
        SELECT '$c' AS "column", bucket, lo, hi, cnt FROM (
          WITH b AS (
            SELECT list_transform(
              quantile_cont(CAST($c AS DOUBLE), [$pcts]),
              x -> round(x, 6)) AS bs
            FROM lineitem WHERE $c IS NOT NULL),
          asg AS (
            SELECT CAST(1 + len(list_filter(b.bs,
                     x -> CAST($c AS DOUBLE) > x)) AS BIGINT) AS bucket,
                   b.bs AS bs
            FROM lineitem CROSS JOIN b WHERE $c IS NOT NULL)
          SELECT bucket,
                 CASE WHEN bucket > 1 THEN bs[CAST(bucket - 1 AS INT)] END AS lo,
                 CASE WHEN bucket < 8 THEN bs[CAST(bucket AS INT)] END AS hi,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM asg GROUP BY bucket, bs)"""
      Seq("l_quantity", "l_extendedprice", "l_discount").map(colSql)
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\", bucket")
    },

    "s11_kll_quantiles" -> """
      WITH v AS (
        SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
        FROM lineitem
        UNION ALL
        SELECT 'ALL', CAST(l_extendedprice AS DOUBLE) FROM lineitem),
      qq AS (
        SELECT g, quantile_cont(v, [0.25, 0.5, 0.75, 0.95]) AS qs,
               COUNT(*) AS n
        FROM v GROUP BY g)
      SELECT g, CAST(([0.25, 0.5, 0.75, 0.95])[i] AS DOUBLE) AS q,
             round(qs[i], 6) AS exact_pct,
             CAST(n AS BIGINT) AS n, TRUE AS approx_ok
      FROM qq CROSS JOIN (VALUES (1), (2), (3), (4)) t(i)
      ORDER BY g, q"""
  )
}
