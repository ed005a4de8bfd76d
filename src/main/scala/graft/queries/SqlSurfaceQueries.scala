package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.sqlx.DorisSql

/** Round-2 SQL-surface gap fills (SURVEY.md §2.3–2.4 grammar rows): plain
  * LEFT/RIGHT OUTER joins, USING equi-joins, HAVING, and the Doris
  * dialect forms Spark lacks — QUALIFY, `LIMIT m,n`, MINUS — executed
  * through the sqlx translator (the oracle runs DuckDB's native QUALIFY/
  * OFFSET/EXCEPT, so the rewrite itself is cross-engine-verified).
  */
object SqlSurfaceQueries extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_left_outer" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer").filter(col("c_custkey") <= 300)
      val o = Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_open"),
             sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("open_total"))
        .orderBy("c_custkey")
    }),

    "q25_right_outer" -> ((s, dir) => {
      // same semantics as q24 mirrored: the right side must survive intact
      val o = Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      val c = Tables.t(s, dir, "customer").filter(col("c_custkey") <= 300)
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_open"),
             count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment")
    }),

    "q26_join_using" -> ((s, dir) => {
      val c = Tables.t(s, dir, "customer").select(
        col("c_custkey").as("custkey"), col("c_mktsegment"))
      val o = Tables.t(s, dir, "orders").select(
        col("o_custkey").as("custkey"), col("o_totalprice"))
      c.join(o, usingColumns = Seq("custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    "q27_having" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_suppkey, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 1700 AND COUNT(*) > 50
        ORDER BY l_suppkey""")
    }),

    "q28_qualify" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey"""))
    }),

    "q29_limit_comma" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15, 25"""))
    }),

    "q30_minus" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT c_nationkey AS nk FROM customer
        MINUS
        SELECT s_nationkey FROM supplier
        ORDER BY nk"""))
    }),

    // MySQL/Doris %-pattern date functions through the translator; the
    // oracle states the same pattern natively via DuckDB's strftime
    "q35_mysql_datefmt" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT date_format(o_orderdate, '%Y-%m') AS ym,
               date_format(date_add(o_orderdate, INTERVAL 1 MONTH), '%Y-%m') AS ym_next,
               COUNT(*) AS n
        FROM orders
        WHERE o_orderdate >= str_to_date('1996-01-01', '%Y-%m-%d')
        GROUP BY date_format(o_orderdate, '%Y-%m'),
                 date_format(date_add(o_orderdate, INTERVAL 1 MONTH), '%Y-%m')
        ORDER BY ym"""))
    }),

    // X-BH: the bitmap/hll trio the reference emits (bitmap = sorted
    // distinct array<bigint>; hll value = 64-bit element hash). The
    // oracle can't recompute xxhash64, so it checks at the cardinality
    // level, where count(distinct hll_hash(x)) = count(distinct x).
    // Doris distribute hint surface: [broadcast] translated to a
    // Catalyst BROADCAST hint (plan shape asserted in DorisSqlSpec; the
    // oracle checks the join result is hint-invariant)
    "q34_distribute_hints" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN [broadcast] nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""))
    }),

    "q31_bitmap_hll" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.DorisCompat.register(s)
      graft.functions.BitmapExprs.register(s)
      // bm_ndv through the MERGEABLE Roaring aggregate, not
      // bitmap_from_array(collect_list(...)): collecting every group
      // member into one array is per-group-linear driver-side state —
      // measured 0.7 s -> 20.4 s at the ×10 probe (the r11 20×-law
      // sweep's one non-fixture breach), an OOM at corpus scale. The
      // scalar bitmap faces (bitmap_from_array / bitmap_count /
      // bitmap_empty) stay exercised on a bounded PER-GROUP array (a
      // per-ROW build costs one Roaring allocation per fact row — the
      // first fix attempt measured that at ~15 s over 6M rows).
      val sv_lineitem = Tables.spreadView(s, dir, "lineitem")
      s.sql(s"""
        SELECT l_linenumber,
               CAST(graft_bitmap_count(graft_bitmap_agg(l_suppkey)) AS BIGINT) AS bm_ndv,
               COUNT(DISTINCT hll_hash(l_suppkey)) AS hll_ndv,
               CAST(bitmap_count(bitmap_from_array(array(
                 min(l_suppkey), min(l_suppkey) + 1, min(l_suppkey))))
                 AS BIGINT) AS bm_pair,
               CAST(bitmap_count(bitmap_empty()) AS BIGINT) AS bm_zero
        FROM ${sv_lineitem}
        GROUP BY l_linenumber
        ORDER BY l_linenumber""")
    }),

    // True SKETCH parity for the bitmap/hll pair (vs q31's value-level
    // model): graft_bitmap_agg is a Roaring64 TypedImperativeAggregate
    // (exact distinct, kilobyte partials, map-side merge) and the HLL
    // side is Spark's built-in datasketches hll_sketch_agg. Per-flag
    // sketches are LANDED to parquet, then the MERGED row re-aggregates
    // the saved sketches alone — no second scan of the fact table, which
    // is the whole point of mergeable sketches at 100 TB. The A&R row
    // exercises scalar bitmap intersection. DuckDB re-derives every
    // count exactly; hll_ok asserts the estimate lands within 5%.
    "q32_sketch_agg" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.BitmapExprs.register(s)
      val out = s"${graft.Land.root}/sketch/q32_perflag"
      s.sql("""
        SELECT l_returnflag AS flag,
               graft_bitmap_agg(l_orderkey) AS bm,
               hll_sketch_agg(l_orderkey) AS hs
        FROM lineitem GROUP BY l_returnflag""")
        .write.mode("overwrite").parquet(out)
      val saved = s.read.parquet(out)
      saved.createOrReplaceTempView("graft_q32_saved")
      val perFlag = s.sql("""
        SELECT flag,
               graft_bitmap_count(bm) AS n_distinct,
               abs(hll_sketch_estimate(hs) - graft_bitmap_count(bm))
                 <= 0.05 * graft_bitmap_count(bm) AS hll_ok
        FROM graft_q32_saved""")
      val merged = s.sql("""
        SELECT 'MERGED' AS flag,
               graft_bitmap_count(graft_bitmap_union_agg(bm)) AS n_distinct,
               abs(hll_sketch_estimate(hll_union_agg(hs))
                   - graft_bitmap_count(graft_bitmap_union_agg(bm)))
                 <= 0.05 * graft_bitmap_count(graft_bitmap_union_agg(bm)) AS hll_ok
        FROM graft_q32_saved""")
      val inter = s.sql("""
        SELECT 'A&R' AS flag,
               graft_bitmap_count(graft_bitmap_and(a.bm, r.bm)) AS n_distinct,
               TRUE AS hll_ok
        FROM graft_q32_saved a JOIN graft_q32_saved r
          ON a.flag = 'A' AND r.flag = 'R'""")
      perFlag.unionByName(merged).unionByName(inter).orderBy("flag")
    }),

    // Doris/MySQL GROUP_CONCAT through the translator (both the
    // SEPARATOR form and the default ", " separator, DISTINCT + ORDER
    // BY) → Spark 4 listagg WITHIN GROUP; the oracle states the same
    // aggregation natively via DuckDB string_agg
    "q37_group_concat" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        SELECT c_mktsegment,
               group_concat(DISTINCT CAST(c_nationkey AS STRING)
                            ORDER BY CAST(c_nationkey AS STRING)
                            SEPARATOR '|') AS nations,
               group_concat(c_name ORDER BY c_name) AS names
        FROM customer WHERE c_custkey <= 200
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
    }),

    // MySQL/Doris scalar functions Spark lacks by NAME (money_format,
    // truncate, field, to_days/from_days) registered in DorisCompat so
    // replayed statements execute unchanged; DuckDB restates each
    // natively. truncate is computed over the identical double ops in
    // both engines, so even FP artifacts agree.
    "q38_doris_funcs" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.DorisCompat.register(s)
      s.sql("""
        SELECT o_orderkey,
               money_format(o_totalprice) AS mf,
               truncate(o_totalprice, 1) AS tr,
               CAST(field(o_orderstatus, 'F', 'O', 'P') AS BIGINT) AS fld,
               to_days(o_orderdate) AS td,
               from_days(to_days(o_orderdate)) AS fd
        FROM orders WHERE o_orderkey <= 300
        ORDER BY o_orderkey""")
    }),

    // Doris TOPN parity: SpaceSaving heavy-hitters summary as a
    // TypedImperativeAggregate — O(capacity) state, mergeable partials.
    // Exact whenever a group's distinct count ≤ capacity (here: 5 event
    // types vs capacity 16), which is what lets DuckDB compare true
    // counts; the approximate regime's error bound is pinned in TopKSpec.
    "q36_topn_sketch" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.TopKAgg.register(s)
      s.sql("""
        SELECT bucket, CAST(pos + 1 AS BIGINT) AS rank, c.value AS value, c.cnt AS cnt
        FROM (
          SELECT user_id % 10 AS bucket, graft_topn(event_type, 3, 16) AS top
          FROM events GROUP BY user_id % 10)
        LATERAL VIEW posexplode(top) t AS pos, c
        ORDER BY bucket, rank""")
    }),

    // Doris WINDOW_FUNNEL parity: max ordered-chain level per user within
    // a sliding window, as ONE mergeable aggregate (state = the user's
    // funnel-relevant (ts, condMask) pairs; the N-way self-join a SQL
    // rewrite would need shuffles the fact table N times — the oracle
    // below pays exactly that price to independently restate the
    // semantics). Window 6h; strictly increasing ts; span ≤ window.
    "q39_window_funnel" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.FunnelAggs.register(s)
      s.sql("""
        SELECT user_id,
               CAST(graft_window_funnel(21600000000, ts,
                 event_type = 'view', event_type = 'click',
                 event_type = 'purchase') AS BIGINT) AS funnel_level
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY user_id ORDER BY user_id""")
    }),

    // Doris RETENTION parity: first-event-gated step flags per user.
    // One Long bitmask of state per group, DeclarativeAggregate (fully
    // codegen'd) — the scalar projections keep the driver-hashed output
    // array-free.
    "q40_retention" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.FunnelAggs.register(s)
      s.sql("""
        SELECT user_id, r[0] AS r_signup, r[1] AS r_purchase, r[2] AS r_error
        FROM (
          SELECT user_id, graft_retention(event_type = 'signup',
                   event_type = 'purchase', event_type = 'error') AS r
          FROM events GROUP BY user_id)
        ORDER BY user_id""")
    }),

    // Doris/ClickHouse SEQUENCE_MATCH / SEQUENCE_COUNT parity: pattern
    // matching over each user's time-sorted relevant events, one
    // mergeable aggregate per pattern (state = (ts, condMask) pairs of
    // rows matching ≥1 condition — rows matching none are skipped, per
    // the reference semantics, which is also what makes adjacency
    // `(?1)(?2)` well-defined). The oracle restates each pattern
    // relationally: EXISTS chains, NOT EXISTS for adjacency, and the
    // lag-transition identity for the greedy non-overlapping count.
    "q41_sequence_match" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      graft.functions.SequenceMatch.register(s)
      s.sql("""
        SELECT user_id,
          graft_sequence_match('(?1)(?t<=7200)(?2)', ts,
            event_type = 'signup', event_type = 'purchase') AS m_signup_purchase,
          graft_sequence_match('(?1)(?2)', ts,
            event_type = 'view', event_type = 'click') AS m_view_click_adj,
          graft_sequence_match('(?1)(?t<=21600)(?2)', ts,
            event_type = 'view', event_type = 'purchase') AS m_view_purchase_6h,
          CAST(graft_sequence_count('(?1).*(?2)', ts,
            event_type = 'view', event_type = 'purchase') AS BIGINT) AS c_view_purchase
        FROM events GROUP BY user_id ORDER BY user_id""")
    }),

    // Doris JSON + ARRAY function surface: get_json_object (Doris
    // json_extract) feeding aggregates, and the array-function family
    // over collected lists. Every output is a SCALAR so the oracle can
    // restate it relationally (DuckDB's bundled json extension extracts;
    // list ops become DISTINCT/bool_or/min/max) — no JSON or array
    // serialization format ever reaches the hash compare.
    "q42_json_array_funcs" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH e AS (SELECT event_type,
                          CAST(get_json_object(props, '$.k') AS INT) AS k,
                          CAST(user_id % 5 AS INT) AS b
                   FROM events)
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MAX(k) AS BIGINT) AS max_k,
               CAST(size(array_distinct(collect_list(b))) AS BIGINT) AS n_buckets,
               array_contains(collect_set(b), 0) AS has_b0,
               CAST(array_max(collect_list(b)) AS BIGINT) AS b_max,
               CAST(element_at(sort_array(collect_set(b)), 1) AS BIGINT) AS b_min
        FROM e GROUP BY event_type ORDER BY event_type""")
    }),

    // window-function family breadth beyond q07/q08's rank/lag/frames:
    // ntile, percent_rank, cume_dist, first/nth/last value with explicit
    // frames, and a sliding-frame average — one named WINDOW, unique
    // tiebreak key so every function is deterministic cross-engine
    "q43_window_breadth" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
               ntile(4) OVER w AS nt,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS fv,
               CAST(nth_value(o_totalprice, 2) OVER (
                 PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS nv2,
               CAST(last_value(o_totalprice) OVER (
                 PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS DOUBLE) AS lv,
               round(avg(CAST(o_totalprice AS DOUBLE)) OVER (
                 PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mv3
        FROM orders WHERE o_orderkey <= 500
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey""")
    }),

    // statistical aggregate family: correlation/covariance/variance and
    // the regr_* linear-regression set, identical definitions in both
    // engines (skewness/kurtosis stay OUT of the oracle set: Spark uses
    // population moments, DuckDB bias-corrected sample moments)
    "q44_stat_aggs" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag,
               round(corr(CAST(l_quantity AS DOUBLE),
                          CAST(l_extendedprice AS DOUBLE)), 6) AS r,
               round(covar_samp(CAST(l_quantity AS DOUBLE),
                                CAST(l_extendedprice AS DOUBLE)), 6) AS cov_s,
               round(covar_pop(CAST(l_quantity AS DOUBLE),
                               CAST(l_extendedprice AS DOUBLE)), 6) AS cov_p,
               round(stddev_samp(CAST(l_extendedprice AS DOUBLE)), 6) AS sd_s,
               round(stddev_pop(CAST(l_extendedprice AS DOUBLE)), 6) AS sd_p,
               round(var_samp(CAST(l_extendedprice AS DOUBLE)), 6) AS v_s,
               round(var_pop(CAST(l_extendedprice AS DOUBLE)), 6) AS v_p,
               round(regr_slope(CAST(l_extendedprice AS DOUBLE),
                                CAST(l_quantity AS DOUBLE)), 6) AS slope,
               round(regr_intercept(CAST(l_extendedprice AS DOUBLE),
                                    CAST(l_quantity AS DOUBLE)), 6) AS icept,
               round(regr_r2(CAST(l_extendedprice AS DOUBLE),
                             CAST(l_quantity AS DOUBLE)), 6) AS r2
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    // grouping()/grouping_id() introspection over ROLLUP plus the exact
    // interpolated median / percentile_cont WITHIN GROUP — both engines
    // share the interpolation definition
    "q45_grouping_median" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               round(median(CAST(l_quantity AS DOUBLE)), 6) AS med,
               round(percentile_cont(0.25) WITHIN GROUP
                 (ORDER BY CAST(l_quantity AS DOUBLE)), 6) AS p25,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }),

    // correlated EXISTS / NOT EXISTS through the SQL parser (q04/q05
    // cover the same semantics via the Dataset semi/anti API; this is
    // the replayed-statement path — Catalyst plans both as semi/anti
    // joins, and the oracle runs the identical statement)
    "q46_exists_correlated" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n_name,
               (SELECT COUNT(*) FROM supplier
                WHERE s_nationkey = n_nationkey) AS n_suppliers
        FROM nation
        WHERE EXISTS (SELECT 1 FROM customer
                      WHERE c_nationkey = n_nationkey AND c_acctbal > 9900)
          AND NOT EXISTS (SELECT 1 FROM supplier
                          WHERE s_nationkey = n_nationkey
                            AND s_acctbal < -990)
        ORDER BY n_name""")
    }),

    // PIVOT through Spark's SQL clause; the oracle restates it as
    // conditional aggregation (DuckDB's PIVOT is a statement, not a
    // subquery clause — the CASE form is the portable meaning)
    "q47_pivot" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT * FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(l_quantity AS DOUBLE) AS qty
          FROM lineitem)
        PIVOT (round(SUM(qty), 2) FOR l_linestatus IN ('F' AS f, 'O' AS o))
        ORDER BY l_returnflag""")
    }),

    // UNPIVOT clause (wide → long); the oracle restates it as the
    // portable UNION ALL of one SELECT per measure
    "q48_unpivot" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT p_partkey, metric, val FROM (
          SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
                 CAST(p_retailprice AS DOUBLE) AS price
          FROM part WHERE p_partkey <= 200)
        UNPIVOT (val FOR metric IN (size, price))
        ORDER BY p_partkey, metric""")
    }),

    // string-function breadth beyond q19: split_part, translate,
    // levenshtein, repeat, lpad/rpad, reverse — shared definitions
    // (split_part 1-based, same edit-distance) in both engines
    "q49_string_breadth" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS first_word,
               translate(p_brand, '#', '-') AS brand_dash,
               CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
               repeat(p_brand, 2) AS brand2,
               lpad(p_brand, 12, '*') AS padded,
               rpad(p_type, 15, '.') AS rpadded,
               reverse(p_name) AS rev
        FROM part WHERE p_partkey <= 300
        ORDER BY p_partkey""")
    }),

    // second tranche of MySQL/Doris scalar-function breadth for the
    // replay dialect: substring_index / elt / conv / bin / locate /
    // instr / hex / space — every one a Spark builtin; the oracle
    // restates each with DuckDB primitives (string_split indexing,
    // to_hex, position) so the SEMANTICS are pinned, not just the name
    "q54_mysql_fn_breadth2" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey,
               substring_index(o_orderpriority, '-', 1) AS pri_code,
               elt(CAST(o_orderkey % 3 + 1 AS INT), 'low', 'mid', 'high') AS bucket,
               conv(o_orderkey, 10, 16) AS okey_hex,
               bin(o_orderkey % 16) AS okey_bin,
               CAST(locate('URGENT', o_orderpriority) AS BIGINT) AS loc_urgent,
               CAST(instr(o_orderstatus, 'O') AS BIGINT) AS ins_o,
               hex(o_orderstatus) AS st_hex,
               concat('[', space(2), ']') AS spaced
        FROM orders WHERE o_orderkey <= 300
        ORDER BY o_orderkey""")
    }),

    // RANGE frames over event time (the moving-window-by-INTERVAL shape
    // replay logs carry): frame membership is defined on the µs epoch on
    // BOTH engines — equal-ts peers all join the frame, so the summed SET
    // is engine-independent even under tie-order differences
    "q55_range_frame" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT user_id, event_id,
               CAST(ts AS TIMESTAMP_NTZ) AS ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
               ROUND(SUM(value) OVER w, 4) AS sum_1h
        FROM events
        WHERE user_id <= 50
        WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")
    }),

    // QUALIFY inside a CTE body — exercises the RECURSIVE rewrite
    // (reference grammar DorisParser.g4 querySpecification allows
    // QUALIFY in any query block; round-5 gap: depth 0 only)
    "q50_qualify_nested" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate("""
        WITH top2 AS (
          SELECT o_custkey, o_orderkey, o_totalprice
          FROM orders
          QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) <= 2)
        SELECT o_custkey, COUNT(*) AS n_top,
               CAST(SUM(o_totalprice) AS DOUBLE) AS top_rev
        FROM top2 GROUP BY o_custkey
        ORDER BY o_custkey LIMIT 0, 100"""))
    }),

    // Spark 4 VARIANT surface: semi-structured shredding without a fixed
    // schema — text JSON is built per row (nested object + array + an
    // explicit null tag), parsed ONCE to the binary VARIANT encoding, and
    // every downstream access is a typed path extraction (variant_get /
    // try_variant_get / is_variant_null). At scale this is the shape that
    // replaces per-access get_json_object re-parses: one parse, many
    // O(log fields) binary lookups, all scan-local. The column pins:
    // typed nested/array paths (sum_k, sum_a), try_variant_get returning
    // NULL on an impossible cast instead of failing the scan (n_bad_cast
    // = 0), the VARIANT-null vs SQL-null distinction (n_null_tag counts
    // "n":null as variant null; n_missing shows an absent path is SQL
    // NULL), and a lossless string round-trip (n_e_match). The
    // schema_of_variant guard proves the binary encoding is uniform
    // across all rows — the precondition for columnar variant shredding.
    "q80_variant_shred" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      // spread: the per-row parse_json + five variant_gets are the
      // query's whole cost, and the single-row-group events file would
      // run them all in ONE scan task (guide §2.5 input skew)
      Tables.spread(Tables.t(s, dir, "events"))
        .createOrReplaceTempView("events_spread_q80")
      val shredded = s.sql("""
        WITH j AS (
          SELECT event_id, event_type,
                 parse_json(concat(
                   '{"u":', CAST(user_id AS STRING),
                   ',"e":"', event_type,
                   '","m":{"k":', get_json_object(props, '$.k'),
                   ',"n":null},"a":[', CAST(user_id % 7 AS STRING),
                   ',', CAST(event_id % 5 AS STRING), ']}')) AS v
          FROM events_spread_q80),
        sh AS (
          SELECT event_type,
                 variant_get(v, '$.u', 'bigint') AS u,
                 variant_get(v, '$.m.k', 'bigint') AS k,
                 variant_get(v, '$.a[0]', 'bigint') AS a0,
                 variant_get(v, '$.a[1]', 'bigint') AS a1,
                 try_variant_get(v, '$.e', 'bigint') AS e_as_num,
                 is_variant_null(variant_get(v, '$.m.n')) AS n_is_null,
                 variant_get(v, '$.missing', 'bigint') AS missing,
                 CAST(variant_get(v, '$.e') AS STRING) AS e_str,
                 schema_of_variant(v) AS sch
          FROM j)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(u) AS BIGINT) AS sum_u,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(SUM(a0 * 10 + a1) AS BIGINT) AS sum_a,
               CAST(COUNT(e_as_num) AS BIGINT) AS n_bad_cast,
               CAST(SUM(CASE WHEN n_is_null THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null_tag,
               CAST(COUNT(missing) AS BIGINT) AS n_missing,
               CAST(SUM(CASE WHEN e_str = event_type THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_e_match,
               CAST(COUNT(DISTINCT sch) AS BIGINT) AS n_schemas
        FROM sh GROUP BY event_type ORDER BY event_type""")
      shredded
    }),

    // Higher-order (lambda) function family over arrays and maps —
    // transform / filter / aggregate(fold) / exists / forall / zip_with /
    // comparator array_sort / transform_values — all codegen-friendly
    // scan-local expressions (the Spark-native replacement for per-row
    // UDF loops over collections). Results reduce to scalars because the
    // oracle gate sanctions scalar result types only; every lambda's
    // OUTPUT still round-trips through the compare (sums/sizes/joins of
    // the produced arrays), so a lambda semantics drift breaks the hash.
    "q81_higher_order" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH a AS (
          SELECT o_orderkey,
                 sequence(1L, o_orderkey % 5 + 2) AS xs
          FROM orders WHERE o_orderkey <= 300)
        SELECT o_orderkey,
          CAST(aggregate(transform(xs, x -> x * x), 0L, (acc, x) -> acc + x)
            AS BIGINT) AS sum_sq,
          CAST(size(filter(xs, x -> x % 2 = 0)) AS BIGINT) AS n_even,
          CAST(aggregate(zip_with(xs, reverse(xs), (l, r) -> l * r),
                         0L, (acc, x) -> acc + x) AS BIGINT) AS dot_rev,
          exists(xs, x -> x = 3) AS has3,
          forall(xs, x -> x > 0) AS allpos,
          array_join(transform(xs, x -> CAST(x AS STRING)), ',') AS joined,
          CAST(element_at(array_sort(xs, (l, r) ->
            CASE WHEN l > r THEN -1 WHEN l < r THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS mx,
          CAST(aggregate(map_values(transform_values(
                 map_from_arrays(xs, xs), (k, v) -> v * 2L)),
               0L, (acc, x) -> acc + x) AS BIGINT) AS sum_doubled
        FROM a ORDER BY o_orderkey""")
    }),

    // Spark 4 COLLATION surface: UTF8_LCASE grouping/equality — mixed-
    // case keys fold into one case-insensitive group without rewriting
    // every predicate through lower() (at scale: the collation is part
    // of the column type, so comparisons/joins/aggregations stay
    // codegen'd instead of wrapping expressions). Mixed case is planted
    // deterministically; outputs are re-normalized to binary strings
    // (lower / min) so the compare never depends on which group
    // representative an engine keeps.
    "q82_collation" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH w AS (
          SELECT p_partkey,
                 CASE WHEN p_partkey % 2 = 0
                      THEN upper(split(p_name, ' ')[0])
                      ELSE split(p_name, ' ')[0] END AS word
          FROM part WHERE p_partkey <= 400),
        c AS (SELECT p_partkey, word,
                     collate(word, 'UTF8_LCASE') AS k FROM w)
        SELECT lower(CAST(k AS STRING COLLATE UTF8_BINARY)) AS w,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN k = collate('almond', 'UTF8_LCASE')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_almond,
               min(word) AS first_bin,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_case_variants
        FROM c GROUP BY k ORDER BY w""")
    }),

    // Linear-regression aggregate family (regr_slope/intercept/r2/count/
    // avgx/avgy + covar_samp/covar_pop) — one streaming-moment pass,
    // map-side partials, mergeable state. Slope/intercept/covar are
    // magnitude-unbounded, so they compare at RELATIVE precision as
    // (mantissa, exponent) pairs via the shared Sig SQL text (the s04
    // lesson); r2 and the means are bounded and round at 1e-6.
    "q83_regr_family" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(regrSql)
    }),

    // Error-safe TRY_* family under ANSI mode (Spark 4's default):
    // division by zero, 64-bit overflow, malformed numeric text, and
    // out-of-bounds array access each return NULL through their try_
    // variant instead of failing the scan — the property that lets one
    // poisoned row NOT kill a 100 TB batch job. The oracle restates every
    // NULL-production rule explicitly (CASE/NULLIF/TRY_CAST), so the
    // compare pins the exact rows each rescue path fires on.
    "q84_try_family" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH t AS (
          SELECT o_orderkey % 5 AS bucket,
                 try_divide(CAST(o_totalprice AS DOUBLE),
                            CAST(o_orderkey % 3 AS DOUBLE)) AS dv,
                 try_add(9223372036854775807L, o_orderkey % 2) AS ov,
                 try_to_number(
                   CASE WHEN o_orderkey % 4 = 0 THEN 'oops'
                        ELSE CAST(o_orderkey AS STRING) END,
                   '999999999') AS tn,
                 try_element_at(array(1L, 2L, 3L),
                                CAST(o_orderkey % 5 AS INT) + 1) AS el,
                 try_cast(o_orderpriority AS INT) AS pc
          FROM orders WHERE o_orderkey <= 2000)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_div0,
               CAST(SUM(CAST(dv AS DECIMAL(28,6))) AS DOUBLE) AS sum_div,
               CAST(SUM(CASE WHEN ov IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_overflow,
               CAST(SUM(CASE WHEN tn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_badnum,
               CAST(SUM(tn) AS BIGINT) AS sum_num,
               CAST(SUM(el) AS BIGINT) AS sum_elem,
               CAST(SUM(CASE WHEN el IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oob,
               CAST(SUM(CASE WHEN pc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_badcast
        FROM t GROUP BY bucket ORDER BY bucket""")
    }),

    // Bitwise scalar + aggregate family: &, |, ^, ~, shifts, bit_count,
    // getbit, and the bit_and/bit_or/bit_xor aggregates — the substrate
    // sketches, bitmap indexes, and mask-encoded funnels build on. All
    // int64 two's-complement, so both engines agree bit-for-bit.
    "q85_bitwise" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH t AS (SELECT o_orderkey % 7 AS g, o_orderkey AS k
                   FROM orders WHERE o_orderkey <= 2000)
        SELECT CAST(g AS BIGINT) AS g,
               CAST(bit_and(k) AS BIGINT) AS all_and,
               CAST(bit_or(k) AS BIGINT) AS all_or,
               CAST(bit_xor(k) AS BIGINT) AS all_xor,
               CAST(SUM(bit_count(k)) AS BIGINT) AS pop_total,
               CAST(SUM(k & 255) AS BIGINT) AS sum_low8,
               CAST(SUM(shiftleft(k % 1024, 3)) AS BIGINT) AS sum_shl,
               CAST(SUM(shiftright(k, 4)) AS BIGINT) AS sum_shr,
               CAST(SUM(CAST(getbit(k, 3) AS BIGINT)) AS BIGINT) AS n_bit3,
               CAST(SUM((~k) & 1023) AS BIGINT) AS sum_not_low
        FROM t GROUP BY g ORDER BY g""")
    }),

    // Table-valued generator breadth beyond q21's LATERAL VIEW explode:
    // posexplode_outer (index + null-row preservation for empty arrays),
    // inline over an array of structs, and stack — each restated in
    // DuckDB via unnest WITH ORDINALITY / VALUES. Null/empty inputs are
    // planted so the _outer semantics are load-bearing, not decorative.
    "q86_generators" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH src AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 10 = 0 THEN array()
                      ELSE sequence(1L, o_orderkey % 3 + 1) END AS xs
          FROM orders WHERE o_orderkey <= 500),
        pe AS (
          SELECT k, pos, x
          FROM src LATERAL VIEW OUTER posexplode(xs) t AS pos, x),
        inl AS (
          SELECT k, f, w
          FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 500)
          LATERAL VIEW inline(array(
            struct(CAST(1 AS BIGINT), 'one'),
            struct(CAST(k % 5 AS BIGINT), 'mod'))) t AS f, w),
        st AS (
          SELECT k, a, b
          FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 500)
          LATERAL VIEW stack(2, 'lo', k % 10, 'hi', k % 100) t AS a, b)
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pe) AS pe_rows,
          (SELECT CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           FROM pe) AS pe_null_rows,
          (SELECT CAST(SUM(pos * 100 + x) AS BIGINT) FROM pe) AS pe_weighted,
          (SELECT CAST(SUM(f) AS BIGINT) FROM inl) AS inl_sum,
          (SELECT CAST(SUM(CASE WHEN w = 'mod' THEN f ELSE 0 END) AS BIGINT)
           FROM inl) AS inl_mod_sum,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM st) AS st_rows,
          (SELECT CAST(SUM(CASE WHEN a = 'hi' THEN b ELSE -b END) AS BIGINT)
           FROM st) AS st_signed""")
    }),

    // SCD-2 temporal dimension join — the warehouse pattern behind every
    // "price as of order time" question: a versioned dimension with
    // [valid_from, valid_to) intervals, facts joined to the version in
    // force at fact time. With BOUNDED versions per key (the SCD-2
    // norm) the scalable plan is the key equi-join plus an interval
    // filter — fan-out ≤ versions, one shuffle, no range-join machinery;
    // unbounded histories would swap in the as-of union-window shape
    // (p15). exactly_once pins the partition property: interval rows
    // tile time, so every fact matches exactly one version.
    "q87_scd2_join" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH dim AS (
          SELECT s_suppkey, v.ver,
                 date_add(DATE'1992-01-01', v.ver * 730) AS valid_from,
                 CASE WHEN v.ver < 2
                      THEN date_add(DATE'1992-01-01', (v.ver + 1) * 730)
                      ELSE DATE'9999-12-31' END AS valid_to,
                 round(s_acctbal, 2) + v.ver * 1000 AS attr
          FROM supplier CROSS JOIN (VALUES (0), (1), (2)) AS v(ver)),
        f AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, l_quantity
              FROM lineitem),
        j AS (SELECT f.l_suppkey, f.l_quantity, dim.ver, dim.attr
              FROM f JOIN dim ON dim.s_suppkey = f.l_suppkey
                AND f.d >= dim.valid_from AND f.d < dim.valid_to)
        SELECT CAST(ver AS BIGINT) AS ver,
               CAST(COUNT(*) AS BIGINT) AS n_facts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(SUM(CAST(attr * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 AS wsum,
               SUM(COUNT(*)) OVER () = (SELECT COUNT(*) FROM f)
                 AS exactly_once
        FROM j GROUP BY ver ORDER BY ver""")
    }),

    // DISTINCT window aggregates: Spark REJECTS COUNT(DISTINCT) OVER, so
    // the engine runs the two canonical rewrites — running distinct =
    // cumulative sum of a first-occurrence flag (row_number = 1 over
    // (partition, value)); partition-total distinct = max(dense_rank by
    // value). DuckDB supports the NATIVE distinct window aggregate, so
    // the oracle states COUNT(DISTINCT ...) OVER directly — the compare
    // cross-validates the rewrite against a real implementation on every
    // row, ties and frame semantics included.
    "q88_windowed_distinct" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH o AS (SELECT o_orderpriority AS prio, o_orderkey AS okey,
                          o_orderdate AS d, o_custkey AS ck
                   FROM orders WHERE o_orderkey <= 2000),
        f AS (SELECT prio, okey, d, ck,
                     CASE WHEN row_number() OVER (
                       PARTITION BY prio, ck ORDER BY d, okey) = 1
                       THEN 1 ELSE 0 END AS first_seen,
                     dense_rank() OVER (
                       PARTITION BY prio ORDER BY ck) AS dr
              FROM o)
        SELECT prio, okey,
               CAST(SUM(first_seen) OVER (
                 PARTITION BY prio ORDER BY d, okey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS running_distinct,
               CAST(MAX(dr) OVER (PARTITION BY prio) AS BIGINT)
                 AS total_distinct
        FROM f ORDER BY prio, okey""")
    }),

    // Same DISTINCT-window semantics as q88, but the query text uses the
    // NATIVE COUNT(DISTINCT …) OVER form and goes through
    // DorisSql.translate — the translator's SIZE(COLLECT_SET(…) OVER …)
    // pass (VERDICT r6 item 4) is what makes Spark accept it. The oracle
    // is the IDENTICAL text run on DuckDB's native DISTINCT window
    // aggregate, so the rewrite is cross-validated row-by-row against a
    // real implementation, ties and frames included.
    "q89_translated_distinct_window" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate(distinctWindowSql))
    }),

    // QUALIFY in EVERY branch of a set-operation chain through the
    // translator (VERDICT r6 item 5): per-branch rewrite, global ORDER
    // BY left outside the last branch. DuckDB runs QUALIFY natively, so
    // the oracle is again the identical text.
    "q90_translated_qualify_union" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(DorisSql.translate(qualifyUnionSql))
    })
  )

  /** Shared Spark/DuckDB text for q89 (Spark side goes through
    * DorisSql.translate; DuckDB runs it natively). */
  private val distinctWindowSql = """
    SELECT prio, okey,
           CAST(COUNT(DISTINCT ck) OVER (
             PARTITION BY prio ORDER BY d, okey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_distinct,
           CAST(COUNT(DISTINCT ck) OVER (PARTITION BY prio) AS BIGINT)
             AS total_distinct
    FROM (SELECT o_orderpriority AS prio, o_orderkey AS okey,
                 o_orderdate AS d, o_custkey AS ck
          FROM orders WHERE o_orderkey <= 2000)
    ORDER BY prio, okey"""

  /** Shared Spark/DuckDB text for q90. */
  private val qualifyUnionSql = """
    SELECT o_custkey AS ck, o_orderkey AS okey,
           CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) = 1
    UNION ALL
    SELECT o_custkey, o_orderkey, -CAST(o_totalprice AS DOUBLE)
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice ASC, o_orderkey) = 1
    ORDER BY ck, okey, price"""

  /** SAME SQL text runs on Spark and DuckDB (Sig embeds portable
    * CASE/log10/power arithmetic), so the two sides cannot drift. */
  private def regrSql: String = {
    import graft.sqlx.Sig
    val slope = "regr_slope(l_extendedprice, l_quantity)"
    val icept = "regr_intercept(l_extendedprice, l_quantity)"
    val cvs = "covar_samp(l_extendedprice, l_quantity)"
    val cvp = "covar_pop(l_extendedprice, l_quantity)"
    s"""
      SELECT l_returnflag,
             CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
             ${Sig.mant(slope)} AS slope_mant, ${Sig.exp(slope)} AS slope_exp,
             ${Sig.mant(icept)} AS icept_mant, ${Sig.exp(icept)} AS icept_exp,
             round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
             round(regr_avgx(l_extendedprice, l_quantity), 6) AS ax,
             round(regr_avgy(l_extendedprice, l_quantity), 6) AS ay,
             ${Sig.mant(cvs)} AS cov_mant, ${Sig.exp(cvs)} AS cov_exp,
             ${Sig.mant(cvp)} AS covp_mant, ${Sig.exp(cvp)} AS covp_exp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  }

  val oracles: Map[String, String] = Map(
    // q89/q90: the SAME text Spark translates runs natively on DuckDB
    "q89_translated_distinct_window" -> distinctWindowSql,
    "q90_translated_qualify_union" -> qualifyUnionSql,

    "q24_left_outer" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_open,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_total
      FROM customer
      LEFT OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
        ON c_custkey = o_custkey
      WHERE c_custkey <= 300
      GROUP BY c_custkey ORDER BY c_custkey""",

    "q25_right_outer" -> """
      SELECT c_mktsegment, COUNT(o_orderkey) AS n_open, COUNT(*) AS n_rows
      FROM (SELECT * FROM orders WHERE o_orderstatus = 'O') o
      RIGHT OUTER JOIN (SELECT * FROM customer WHERE c_custkey <= 300) c
        ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q26_join_using" -> """
      SELECT c_mktsegment, COUNT(*) AS n
      FROM (SELECT c_custkey AS custkey, c_mktsegment FROM customer) c
      JOIN (SELECT o_custkey AS custkey, o_totalprice FROM orders) o
        USING (custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q27_having" -> """
      SELECT l_suppkey, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 1700 AND COUNT(*) > 50
      ORDER BY l_suppkey""",

    "q28_qualify" -> """
      SELECT o_custkey, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey) <= 2
      ORDER BY o_custkey, o_totalprice DESC, o_orderkey""",

    "q29_limit_comma" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25 OFFSET 15""",

    "q30_minus" -> """
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nk""",

    "q35_mysql_datefmt" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m') AS ym_next,
             COUNT(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY strftime(o_orderdate, '%Y-%m'),
               strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m')
      ORDER BY ym""",

    "q34_distribute_hints" -> """
      SELECT n_name, COUNT(*) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "q31_bitmap_hll" -> """
      SELECT l_linenumber,
             COUNT(DISTINCT l_suppkey) AS bm_ndv,
             COUNT(DISTINCT l_suppkey) AS hll_ndv,
             CAST(2 AS BIGINT) AS bm_pair,
             CAST(0 AS BIGINT) AS bm_zero
      FROM lineitem
      GROUP BY l_linenumber
      ORDER BY l_linenumber""",

    "q32_sketch_agg" -> """
      SELECT flag, n_distinct, hll_ok FROM (
        SELECT l_returnflag AS flag,
               count(DISTINCT l_orderkey) AS n_distinct, TRUE AS hll_ok
        FROM lineitem GROUP BY 1
        UNION ALL
        SELECT 'MERGED', count(DISTINCT l_orderkey), TRUE FROM lineitem
        UNION ALL
        SELECT 'A&R',
               (SELECT count(*) FROM
                 (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
                  INTERSECT
                  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')),
               TRUE)
      ORDER BY flag""",

    "q37_group_concat" -> """
      SELECT c_mktsegment,
             string_agg(DISTINCT CAST(c_nationkey AS VARCHAR), '|'
                        ORDER BY CAST(c_nationkey AS VARCHAR)) AS nations,
             string_agg(c_name, ', ' ORDER BY c_name) AS names
      FROM customer WHERE c_custkey <= 200
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q38_doris_funcs" -> """
      SELECT o_orderkey,
             format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) || '.' ||
               lpad(CAST(CAST(o_totalprice * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0') AS mf,
             trunc(CAST(o_totalprice AS DOUBLE) * 10) / 10 AS tr,
             CAST(CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2
                  WHEN 'P' THEN 3 ELSE 0 END AS BIGINT) AS fld,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) + 719528 AS BIGINT) AS td,
             CAST(o_orderdate AS DATE) AS fd
      FROM orders WHERE o_orderkey <= 300
      ORDER BY o_orderkey""",

    "q36_topn_sketch" -> """
      WITH c AS (
        SELECT user_id % 10 AS bucket, event_type AS value, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT bucket, value, cnt,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY cnt DESC, value) AS rank
        FROM c)
      SELECT bucket, rank, value, cnt FROM r WHERE rank <= 3
      ORDER BY bucket, rank""",

    "q39_window_funnel" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
                 WHERE event_type IN ('view', 'click', 'purchase')),
      u AS (SELECT DISTINCT user_id FROM e)
      SELECT user_id, CAST(CASE
        WHEN EXISTS (SELECT 1 FROM e a, e b, e c
          WHERE a.user_id = u.user_id AND b.user_id = u.user_id
            AND c.user_id = u.user_id
            AND a.event_type = 'view' AND b.event_type = 'click'
            AND c.event_type = 'purchase'
            AND b.t > a.t AND c.t > b.t
            AND c.t - a.t <= 21600000000) THEN 3
        WHEN EXISTS (SELECT 1 FROM e a, e b
          WHERE a.user_id = u.user_id AND b.user_id = u.user_id
            AND a.event_type = 'view' AND b.event_type = 'click'
            AND b.t > a.t AND b.t - a.t <= 21600000000) THEN 2
        WHEN EXISTS (SELECT 1 FROM e a
          WHERE a.user_id = u.user_id AND a.event_type = 'view') THEN 1
        ELSE 0 END AS BIGINT) AS funnel_level
      FROM u ORDER BY user_id""",

    "q40_retention" -> """
      SELECT user_id,
             bool_or(event_type = 'signup') AS r_signup,
             bool_or(event_type = 'signup') AND bool_or(event_type = 'purchase')
               AS r_purchase,
             bool_or(event_type = 'signup') AND bool_or(event_type = 'error')
               AS r_error
      FROM events GROUP BY user_id ORDER BY user_id""",

    "q41_sequence_match" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      sp AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
             WHERE event_type IN ('signup', 'purchase')),
      vc AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
             WHERE event_type IN ('view', 'click')),
      vp AS (SELECT user_id, epoch_us(ts) AS t, event_type FROM events
             WHERE event_type IN ('view', 'purchase')),
      cnt AS (
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                 AND prev = 'view' THEN 1 ELSE 0 END), 0) AS c
        FROM (SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY t) AS prev
              FROM vp)
        GROUP BY user_id)
      SELECT u.user_id,
        EXISTS (SELECT 1 FROM sp a, sp b
                WHERE a.user_id = u.user_id AND b.user_id = u.user_id
                  AND a.event_type = 'signup' AND b.event_type = 'purchase'
                  AND b.t > a.t
                  AND b.t - a.t <= 7200000000) AS m_signup_purchase,
        EXISTS (SELECT 1 FROM vc a, vc b
                WHERE a.user_id = u.user_id AND b.user_id = u.user_id
                  AND a.event_type = 'view' AND b.event_type = 'click'
                  AND b.t > a.t
                  AND NOT EXISTS (SELECT 1 FROM vc x
                    WHERE x.user_id = u.user_id
                      AND x.t > a.t AND x.t < b.t)) AS m_view_click_adj,
        EXISTS (SELECT 1 FROM vp a, vp b
                WHERE a.user_id = u.user_id AND b.user_id = u.user_id
                  AND a.event_type = 'view' AND b.event_type = 'purchase'
                  AND b.t > a.t
                  AND b.t - a.t <= 21600000000) AS m_view_purchase_6h,
        CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c_view_purchase
      FROM u LEFT JOIN cnt ON cnt.user_id = u.user_id
      ORDER BY u.user_id""",

    "q42_json_array_funcs" -> """
      WITH e AS (SELECT event_type,
                        CAST(json_extract_string(props, '$.k') AS INT) AS k,
                        CAST(user_id % 5 AS INT) AS b
                 FROM events)
      SELECT event_type,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             CAST(MAX(k) AS BIGINT) AS max_k,
             COUNT(DISTINCT b) AS n_buckets,
             bool_or(b = 0) AS has_b0,
             CAST(MAX(b) AS BIGINT) AS b_max,
             CAST(MIN(b) AS BIGINT) AS b_min
      FROM e GROUP BY event_type ORDER BY event_type""",

    "q43_window_breadth" -> """
      SELECT o_orderkey,
             ntile(4) OVER w AS nt,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS fv,
             CAST(nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS nv2,
             CAST(last_value(o_totalprice) OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS DOUBLE) AS lv,
             round(avg(CAST(o_totalprice AS DOUBLE)) OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mv3
      FROM orders WHERE o_orderkey <= 500
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey""",

    "q44_stat_aggs" -> """
      SELECT l_returnflag,
             round(corr(CAST(l_quantity AS DOUBLE),
                        CAST(l_extendedprice AS DOUBLE)), 6) AS r,
             round(covar_samp(CAST(l_quantity AS DOUBLE),
                              CAST(l_extendedprice AS DOUBLE)), 6) AS cov_s,
             round(covar_pop(CAST(l_quantity AS DOUBLE),
                             CAST(l_extendedprice AS DOUBLE)), 6) AS cov_p,
             round(stddev_samp(CAST(l_extendedprice AS DOUBLE)), 6) AS sd_s,
             round(stddev_pop(CAST(l_extendedprice AS DOUBLE)), 6) AS sd_p,
             round(var_samp(CAST(l_extendedprice AS DOUBLE)), 6) AS v_s,
             round(var_pop(CAST(l_extendedprice AS DOUBLE)), 6) AS v_p,
             round(regr_slope(CAST(l_extendedprice AS DOUBLE),
                              CAST(l_quantity AS DOUBLE)), 6) AS slope,
             round(regr_intercept(CAST(l_extendedprice AS DOUBLE),
                                  CAST(l_quantity AS DOUBLE)), 6) AS icept,
             round(regr_r2(CAST(l_extendedprice AS DOUBLE),
                           CAST(l_quantity AS DOUBLE)), 6) AS r2
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q45_grouping_median" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             round(median(CAST(l_quantity AS DOUBLE)), 6) AS med,
             round(percentile_cont(0.25) WITHIN GROUP
               (ORDER BY CAST(l_quantity AS DOUBLE)), 6) AS p25,
             COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q46_exists_correlated" -> """
      SELECT n_name,
             (SELECT COUNT(*) FROM supplier
              WHERE s_nationkey = n_nationkey) AS n_suppliers
      FROM nation
      WHERE EXISTS (SELECT 1 FROM customer
                    WHERE c_nationkey = n_nationkey AND c_acctbal > 9900)
        AND NOT EXISTS (SELECT 1 FROM supplier
                        WHERE s_nationkey = n_nationkey
                          AND s_acctbal < -990)
      ORDER BY n_name""",

    "q47_pivot" -> """
      SELECT l_returnflag,
             round(SUM(CASE WHEN l_linestatus = 'F'
                            THEN CAST(l_quantity AS DOUBLE) END), 2) AS f,
             round(SUM(CASE WHEN l_linestatus = 'O'
                            THEN CAST(l_quantity AS DOUBLE) END), 2) AS o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q48_unpivot" -> """
      WITH src AS (
        SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
               CAST(p_retailprice AS DOUBLE) AS price
        FROM part WHERE p_partkey <= 200)
      SELECT p_partkey, 'size' AS metric, size AS val FROM src
      UNION ALL
      SELECT p_partkey, 'price', price FROM src
      ORDER BY p_partkey, metric""",

    "q49_string_breadth" -> """
      SELECT p_partkey,
             split_part(p_name, ' ', 1) AS first_word,
             translate(p_brand, '#', '-') AS brand_dash,
             CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
             repeat(p_brand, 2) AS brand2,
             lpad(p_brand, 12, '*') AS padded,
             rpad(p_type, 15, '.') AS rpadded,
             reverse(p_name) AS rev
      FROM part WHERE p_partkey <= 300
      ORDER BY p_partkey""",

    "q50_qualify_nested" -> """
      WITH top2 AS (
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) <= 2)
      SELECT o_custkey, COUNT(*) AS n_top,
             CAST(SUM(o_totalprice) AS DOUBLE) AS top_rev
      FROM top2 GROUP BY o_custkey
      ORDER BY o_custkey LIMIT 100 OFFSET 0""",

    "q54_mysql_fn_breadth2" -> """
      SELECT o_orderkey,
             string_split(o_orderpriority, '-')[1] AS pri_code,
             (['low', 'mid', 'high'])[CAST(o_orderkey % 3 + 1 AS INT)] AS bucket,
             upper(to_hex(o_orderkey)) AS okey_hex,
             bin(o_orderkey % 16) AS okey_bin,
             CAST(position('URGENT' IN o_orderpriority) AS BIGINT) AS loc_urgent,
             CAST(instr(o_orderstatus, 'O') AS BIGINT) AS ins_o,
             hex(o_orderstatus) AS st_hex,
             '[' || repeat(' ', 2) || ']' AS spaced
      FROM orders WHERE o_orderkey <= 300
      ORDER BY o_orderkey""",

    "q55_range_frame" -> """
      SELECT user_id, event_id, ts,
             COUNT(*) OVER w AS n_1h,
             ROUND(CAST(SUM(value) OVER w AS DOUBLE), 4) AS sum_1h
      FROM events
      WHERE user_id <= 50
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    // Restates the variant semantics on the RAW columns: the data-bearing
    // aggregates (n, sum_u, sum_k, sum_a) are recomputed from the same
    // inputs the JSON was built from, and the semantics pins are the
    // independently-derived expected values — try_variant_get of a word
    // to BIGINT is NULL for every row (0), "n":null is variant null on
    // every row (n), an absent path is SQL NULL (0), the string round
    // trip is lossless (n), and the per-row variant schema is uniform (1)
    "q80_variant_shred" -> """
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS sum_u,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             CAST(SUM((user_id % 7) * 10 + (event_id % 5)) AS BIGINT) AS sum_a,
             CAST(0 AS BIGINT) AS n_bad_cast,
             CAST(COUNT(*) AS BIGINT) AS n_null_tag,
             CAST(0 AS BIGINT) AS n_missing,
             CAST(COUNT(*) AS BIGINT) AS n_e_match,
             CAST(1 AS BIGINT) AS n_schemas
      FROM events GROUP BY event_type ORDER BY event_type""",

    // every lambda restated with DuckDB list primitives; generate_series
    // is inclusive like Spark's sequence
    "q81_higher_order" -> """
      WITH a AS (
        SELECT o_orderkey, generate_series(1, o_orderkey % 5 + 2) AS xs
        FROM orders WHERE o_orderkey <= 300)
      SELECT o_orderkey,
        CAST(list_sum(list_transform(xs, x -> x * x)) AS BIGINT) AS sum_sq,
        CAST(len(list_filter(xs, x -> x % 2 = 0)) AS BIGINT) AS n_even,
        CAST(list_sum(list_transform(generate_series(1, len(xs)),
               i -> xs[i] * xs[len(xs) - i + 1])) AS BIGINT) AS dot_rev,
        list_contains(xs, 3) AS has3,
        len(list_filter(xs, x -> x <= 0)) = 0 AS allpos,
        array_to_string(list_transform(xs, x -> CAST(x AS VARCHAR)), ',')
          AS joined,
        CAST(list_max(xs) AS BIGINT) AS mx,
        CAST(2 * list_sum(xs) AS BIGINT) AS sum_doubled
      FROM a ORDER BY o_orderkey""",

    // case-insensitive grouping restated as lower(); n_case_variants
    // counts the planted binary-distinct spellings per folded key
    "q82_collation" -> """
      WITH w AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 2 = 0
                    THEN upper(string_split(p_name, ' ')[1])
                    ELSE string_split(p_name, ' ')[1] END AS word
        FROM part WHERE p_partkey <= 400)
      SELECT lower(word) AS w,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN lower(word) = 'almond'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_almond,
             min(word) AS first_bin,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_case_variants
      FROM w GROUP BY lower(word) ORDER BY w""",

    "q83_regr_family" -> regrSql,

    // every try_ rescue restated as its explicit NULL-production rule
    "q84_try_family" -> """
      WITH t AS (
        SELECT o_orderkey % 5 AS bucket,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 3)
               END AS dv,
               CASE WHEN o_orderkey % 2 = 1 THEN NULL
                    ELSE 9223372036854775807 END AS ov,
               TRY_CAST(CASE WHEN o_orderkey % 4 = 0 THEN 'oops'
                             ELSE CAST(o_orderkey AS VARCHAR) END
                        AS BIGINT) AS tn,
               CASE WHEN o_orderkey % 5 + 1 <= 3
                    THEN ([1, 2, 3])[CAST(o_orderkey % 5 AS INT) + 1]
               END AS el,
               TRY_CAST(o_orderpriority AS INT) AS pc
        FROM orders WHERE o_orderkey <= 2000)
      SELECT CAST(bucket AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_div0,
             CAST(SUM(CAST(dv AS DECIMAL(28,6))) AS DOUBLE) AS sum_div,
             CAST(SUM(CASE WHEN ov IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overflow,
             CAST(SUM(CASE WHEN tn IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_badnum,
             CAST(SUM(tn) AS BIGINT) AS sum_num,
             CAST(SUM(el) AS BIGINT) AS sum_elem,
             CAST(SUM(CASE WHEN el IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oob,
             CAST(SUM(CASE WHEN pc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_badcast
      FROM t GROUP BY bucket ORDER BY bucket""",

    "q85_bitwise" -> """
      WITH t AS (SELECT o_orderkey % 7 AS g, o_orderkey AS k
                 FROM orders WHERE o_orderkey <= 2000)
      SELECT CAST(g AS BIGINT) AS g,
             CAST(bit_and(k) AS BIGINT) AS all_and,
             CAST(bit_or(k) AS BIGINT) AS all_or,
             CAST(bit_xor(k) AS BIGINT) AS all_xor,
             CAST(SUM(bit_count(k)) AS BIGINT) AS pop_total,
             CAST(SUM(k & 255) AS BIGINT) AS sum_low8,
             CAST(SUM((k % 1024) << 3) AS BIGINT) AS sum_shl,
             CAST(SUM(k >> 4) AS BIGINT) AS sum_shr,
             CAST(SUM(CASE WHEN (k & 8) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bit3,
             CAST(SUM((~k) & 1023) AS BIGINT) AS sum_not_low
      FROM t GROUP BY g ORDER BY g""",

    // posexplode -> unnest WITH ORDINALITY (1-based, so pos = ord-1);
    // the empty-array _outer row surfaces via a LEFT JOIN on the
    // unnested set; inline/stack restate as VALUES cross joins
    "q86_generators" -> """
      WITH src AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 10 = 0 THEN []
                    ELSE generate_series(1, o_orderkey % 3 + 1) END AS xs
        FROM orders WHERE o_orderkey <= 500),
      ex AS (
        SELECT k, unnest(range(0, len(xs))) AS pos, unnest(xs) AS x
        FROM src),
      pe AS (
        SELECT s.k, e.pos, e.x
        FROM src s LEFT JOIN ex e ON e.k = s.k),
      inl AS (
        SELECT s.k, v.f0 AS f, v.w
        FROM (SELECT k FROM src) s
        CROSS JOIN LATERAL (VALUES (CAST(1 AS BIGINT), 'one'),
                                   (CAST(s.k % 5 AS BIGINT), 'mod'))
          AS v(f0, w)),
      st AS (
        SELECT s.k, v.a, v.b
        FROM (SELECT k FROM src) s
        CROSS JOIN LATERAL (VALUES ('lo', s.k % 10), ('hi', s.k % 100))
          AS v(a, b))
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pe) AS pe_rows,
        (SELECT CAST(SUM(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM pe) AS pe_null_rows,
        (SELECT CAST(SUM(pos * 100 + x) AS BIGINT) FROM pe) AS pe_weighted,
        (SELECT CAST(SUM(f) AS BIGINT) FROM inl) AS inl_sum,
        (SELECT CAST(SUM(CASE WHEN w = 'mod' THEN f ELSE 0 END) AS BIGINT)
         FROM inl) AS inl_mod_sum,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM st) AS st_rows,
        (SELECT CAST(SUM(CASE WHEN a = 'hi' THEN b ELSE -b END) AS BIGINT)
         FROM st) AS st_signed""",

    "q87_scd2_join" -> """
      WITH dim AS (
        SELECT s_suppkey, v.ver,
               DATE '1992-01-01' + (v.ver * 730) AS valid_from,
               CASE WHEN v.ver < 2
                    THEN DATE '1992-01-01' + ((v.ver + 1) * 730)
                    ELSE DATE '9999-12-31' END AS valid_to,
               round(s_acctbal, 2) + v.ver * 1000 AS attr
        FROM supplier CROSS JOIN (VALUES (0), (1), (2)) AS v(ver)),
      f AS (SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d, l_quantity
            FROM lineitem),
      j AS (SELECT f.l_suppkey, f.l_quantity, dim.ver, dim.attr
            FROM f JOIN dim ON dim.s_suppkey = f.l_suppkey
              AND f.d >= dim.valid_from AND f.d < dim.valid_to)
      SELECT CAST(ver AS BIGINT) AS ver,
             CAST(COUNT(*) AS BIGINT) AS n_facts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
             CAST(SUM(CAST(attr * l_quantity AS DECIMAL(28,6))) AS DOUBLE)
               AS wsum,
             SUM(COUNT(*)) OVER () = (SELECT COUNT(*) FROM f)
               AS exactly_once
      FROM j GROUP BY ver ORDER BY ver""",

    "q88_windowed_distinct" -> """
      WITH o AS (SELECT o_orderpriority AS prio, o_orderkey AS okey,
                        o_orderdate AS d, o_custkey AS ck
                 FROM orders WHERE o_orderkey <= 2000)
      SELECT prio, okey,
             CAST(COUNT(DISTINCT ck) OVER (
               PARTITION BY prio ORDER BY d, okey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_distinct,
             CAST(COUNT(DISTINCT ck) OVER (PARTITION BY prio) AS BIGINT)
               AS total_distinct
      FROM o ORDER BY prio, okey"""
  )
}
