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
}
