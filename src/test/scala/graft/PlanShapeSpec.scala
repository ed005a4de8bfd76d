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

  test("no query plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries with unbounded cartesian joins: ${offenders.mkString(", ")}")
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
