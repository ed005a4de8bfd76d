package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the correctness gate only checks what
  * exists in BOTH maps, so drift between queries and oracles silently
  * narrows the gate (round-3 postmortem: a failing query vanished from
  * CORRECTNESS instead of erring). This spec makes any gap a compile-
  * adjacent failure instead of a missing row three rounds later. */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are stable lowercase identifiers with family prefixes") {
    val re = "^[a-z][a-z0-9]*[0-9]{2}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => re.matches(n))
    assert(bad.isEmpty, s"non-conforming query names: ${bad.toSeq.sorted}")
  }

  test("no duplicate names across modules (Map.++ would silently drop one)") {
    val perModule = Seq(
      graft.queries.RelationalQueries, graft.queries.GendataQueries,
      graft.queries.WorkloadQueries, graft.queries.DiffStatsQueries,
      graft.queries.PipelineQueries, graft.queries.AnonQueries,
      graft.queries.CreateQueries, graft.queries.SqlSurfaceQueries,
      graft.queries.IoQueries).map(m => m.queries.keys.toSeq)
    val all = perModule.flatten
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.toSeq.sorted}")
    assert(all.size == SparkEntry.queries.size)
  }
}
