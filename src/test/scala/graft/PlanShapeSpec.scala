package graft

import org.apache.spark.sql.functions._

/** Systematic scale-safety audit: EVERY driver-contract query's physical
  * plan must be free of unbounded CartesianProduct nodes. Broadcast
  * nested-loop joins are permitted — BNLJ is by construction bounded by
  * its broadcast side (the recall guards' probe-prefix brute force is
  * exactly that shape, deliberately) — but a shuffled cartesian means a
  * non-equi join slipped through and would melt at 100 TB.
  *
  * Building a query executes its eager parts (landed writes, in-query
  * guards), so this spec doubles as an all-surface smoke run at sf0.001.
  */
class PlanShapeSpec extends SparkSpec {

  // --- Single-partition-funnel allowlist -------------------------------
  // Queries whose plans contain an empty-partition Window (or an explicit
  // 1-partition repartition) over input that is BOUNDED by construction —
  // each entry names the bound. An entry that stops firing fails the lint
  // (stale allowlists hide regressions); an unlisted hit fails it too.
  // This is the bug class that produced findings two rounds running
  // (r6 single-partition vocab rank, r7 Lm vocab totals): a window/sort
  // with no partition key funnels its whole input through ONE reducer,
  // which only survives 100 TB when that input is bounded metadata.
  // r12: the audited bounded windows in Mixing/Ranks/IoQueries and the
  // group-split fold fractions now carry a LITERAL partition key (same
  // single-partition execution, no WindowExec warning, and this lint no
  // longer sees them as unpartitioned) — their allowlist entries are
  // gone. What remains funnels through a real empty partition spec.
  private val funnelAllow: Map[String, String] = Map(
    "p33_bpe_merges" -> "rank window over limit(k=30) merge rows",
    "q17_cte" -> "rank window over supplier-grain aggregate (dimension-bounded)",
    "q87_scd2_join" -> "SUM(COUNT) OVER () over GROUP BY ver output (3 rows)"
    // s09/s11 run their |columns|- or |groups|-row rank-base windows at
    // BUILD time (results collect to bounded literals), so the returned
    // plans carry no window — nothing to allowlist.
  )

  // Structural exception: Ranks.globalRowNumber / globalCumSum carry an
  // empty-partition cumulative window over their per-partition totals
  // table — exactly numPartitions rows, the one place that plan is the
  // CORRECT one. Recognized by the first Aggregate below the window
  // grouping on the synthetic __pid (spark_partition_id) column.
  private def boundedByPid(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.exists(_.references.exists(_.name == "__pid"))
    }.getOrElse(false)

  private def funnels(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] =
    plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty && !boundedByPid(w.child) =>
        "empty-partition Window"
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
          if r.numPartitions == 1 => "repartition/coalesce(1)"
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
          if r.optNumPartitions.contains(1) => "repartitionByExpression(1)"
    }

  test("all-surface plan lint: no CartesianProduct, no single-partition funnel over unbounded input") {
    val dir = "/root/testdata/sf0.001"
    val offenders = Seq.newBuilder[String]
    val fired = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, dir).queryExecution
      if (qe.executedPlan.toString.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      // the ANALYZED plan sees the full lineage — cache substitution
      // (sizeGated persists its aggregate mid-build) happens later, so a
      // funnel can't hide inside an InMemoryRelation here
      val hits = funnels(qe.analyzed)
      if (hits.nonEmpty) {
        if (funnelAllow.contains(name)) fired += name
        else offenders += s"$name: ${hits.distinct.mkString(", ")}"
      }
    }
    val bad = offenders.result()
    assert(bad.isEmpty, s"plan-lint offenders:\n  ${bad.mkString("\n  ")}")
    val stale = funnelAllow.keySet -- fired
    assert(stale.isEmpty,
      s"allowlist entries that no longer fire (remove them): ${stale.mkString(", ")}")
  }

  // The two scan disciplines the 100 TB story depends on, pinned on
  // representative queries so a refactor that silently breaks them
  // (e.g. wrapping the scan in a non-pushable expression) fails here
  // rather than in a cluster bill.

  // the pretty plan string truncates long scan lines, so these read the
  // FORMATTED explain, whose per-node detail section is untruncated
  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("filter pushdown reaches the parquet scan (q02)") {
    val plan = formatted("q02_filter_project")
    assert(plan.contains("PushedFilters: ["), "no pushed-filter section in scan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"l_shipdate range not pushed to parquet:\n${plan.take(1500)}")
    assert(plan.contains("LessThan(l_quantity,10.0)"),
      "l_quantity < 10 not pushed to parquet")
  }

  test("column pruning narrows ReadSchema to referenced columns (q02, q60)") {
    def readSchemas(name: String): Seq[String] =
      "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(formatted(name))
        .map(_.group(1)).toSeq
    // q02 projects 3 columns + filters on 2 more: the 11-column lineitem
    // scan must read exactly the 5 referenced ones
    val q02 = readSchemas("q02_filter_project")
    assert(q02.nonEmpty)
    val cols = q02.head.split(",").map(_.split(":").head).toSet
    assert(cols == Set("l_orderkey", "l_linenumber", "l_extendedprice",
      "l_shipdate", "l_quantity"),
      s"q02 scan reads ${cols.mkString(",")} — pruning broken")
    // q60 touches orders only for (o_custkey, o_orderkey, o_orderpriority)
    assert(readSchemas("q60_custdist").exists { s =>
      val c = s.split(",").map(_.split(":").head).toSet
      c == Set("o_custkey", "o_orderkey", "o_orderpriority")
    }, "q60 orders scan not pruned to its 3 referenced columns")
  }

  test("weighted sampling compiles to TakeOrderedAndProject, not a global sort (p91)") {
    // ORDER BY + LIMIT k must plan per-partition partial top-k; a
    // refactor that materializes a full global sort of the corpus to
    // take 20 rows fails here, not in a cluster bill
    val plan = formatted("p91_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      s"p91 lost its partial top-k plan:\n${plan.take(1200)}")
  }
}
