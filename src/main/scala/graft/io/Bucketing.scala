package graft.io

import org.apache.spark.sql.DataFrame

/** Co-located joins via bucketed tables — the shuffle-elimination story
  * for repeated large-fact joins at 100 TB: two tables bucketed (and
  * sorted) the same way on the join keys sort-merge-join with NO
  * Exchange on either side; the shuffle is paid once at write time and
  * amortized over every subsequent join/aggregation on those keys.
  * (Requires `spark.sql.sources.bucketing.enabled`, on by default.)
  */
object Bucketing {

  /** Write `df` as a managed bucketed+sorted table on `keys`. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, format: String = "parquet"): Unit =
    df.write
      .format(format)
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** True when the physical plan of `joined` contains no SHUFFLE
    * exchange — the property bucketed co-location buys (exposed for
    * tests/diagnostics). Matches any line whose operator is a bare
    * "Exchange <partitioning>" — which is how ShuffleExchangeExec
    * renders for EVERY partitioning scheme (hash, range, single,
    * round-robin, DSv2 key-grouped, future ones) — while
    * "BroadcastExchange" keeps its distinct prefix, and a
    * broadcast-join plan is genuinely shuffle-free. A generic match,
    * not an enumerated whitelist: r10 enumerated four render strings
    * and would have misreported any fifth scheme as shuffle-free.
    * String match, not a tree walk: under AQE the executed plan nests
    * inside AdaptiveSparkPlanExec, which toString renders fully but
    * exists() does not traverse into. */
  def isShuffleFree(joined: DataFrame): Boolean = {
    val plan = joined.queryExecution.executedPlan.toString
    // operator names render after tree-drawing glyphs (+- , :- , spaces);
    // with "BroadcastExchange" masked out first, any remaining
    // "Exchange <partitioning>" at an operator position is a shuffle
    // ("ReusedExchange" has a word char before the E and never matches
    // the operator-boundary pattern)
    !"""(?m)(^|[\s:+-])Exchange """.r.findFirstIn(
      plan.replace("BroadcastExchange", "BX")).isDefined
  }
}
