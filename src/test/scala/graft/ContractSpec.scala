package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: the correctness gate only checks what
  * exists in BOTH maps, so drift between queries and oracles silently
  * narrows the gate (round-3 postmortem: a failing query vanished from
  * CORRECTNESS instead of erring). This spec makes any gap a compile-
  * adjacent failure instead of a missing row three rounds later. */
class ContractSpec extends SparkSpec {

  /** Queries DELIBERATELY without an oracle (driver contract: "omit for
    * non-SQL-expressible ops → rows-only check"). Each entry must name
    * the spec that carries its correctness instead; anything not listed
    * here still fails the gap gate below. */
  private val rowsOnlyQueries = Map.empty[String, String]
  // (previously p93_compress_quality — its repeated-8-gram face is now
  // fully oracle-checked; the zlib production signal stays pinned by
  // CompressSpec + the query's in-query corr/ordinal bridges)

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet -- rowsOnlyQueries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    assert((rowsOnlyQueries.keySet -- SparkEntry.queries.keySet).isEmpty,
      "rows-only allowlist names a query that no longer exists")
    assert(rowsOnlyQueries.keySet.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "a rows-only query grew an oracle — remove it from the allowlist")
  }

  test("query names are stable lowercase identifiers with family prefixes") {
    val re = "^[a-z][a-z0-9]*[0-9]{2}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n => re.matches(n))
    assert(bad.isEmpty, s"non-conforming query names: ${bad.toSeq.sorted}")
  }

  test("every oracle's DuckDB result types are in the sanctioned set") {
    // Round 5's one red row (q41) was an uncast DuckDB aggregate: DuckDB
    // SUM(INTEGER) yields HUGEINT where Spark emits BIGINT, values match,
    // the driver's type-sensitive hasher fails. This gate evaluates every
    // oracle in DuckDB (plan only — LIMIT-0-equivalent types) and rejects
    // any column type outside the driver-proven set. Cancels (not passes)
    // if the local python/duckdb bridge is absent.
    import scala.sys.process._
    val probe = Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    assume(probe == 0, "python3+duckdb bridge not available")
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists, "testdata absent")
    // Oracles that re-read query side outputs (`read_parquet(...)` — the
    // driver exposes the base tables as views, so any read_parquet in an
    // oracle is a side-output path) can only type-plan after the Spark
    // query has landed them. Run exactly those queries first so the gate
    // is hermetic: a clean /tmp otherwise turns ~16 rows into false
    // "failed to plan" noise (bitten in round 6).
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter(o => Seq("read_parquet(", "read_json(", "read_csv(", "read_text(")
        .exists(o._2.contains))
      .foreach { case (n, _) => SparkEntry.queries(n)(spark, sfDir) }
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, OracleJson(SparkEntry.oracleSql))
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/oracle_types.py", tmp.toString, sfDir))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"unsanctioned oracle result types:\n$out")
  }

  test("no duplicate names across modules (Map.++ would silently drop one)") {
    val perModule = Seq(
      graft.queries.RelationalQueries, graft.queries.GendataQueries,
      graft.queries.WorkloadQueries, graft.queries.DiffStatsQueries,
      graft.queries.PipelineQueries, graft.queries.AnonQueries,
      graft.queries.CreateQueries, graft.queries.SqlSurfaceQueries,
      graft.queries.IoQueries, graft.queries.CurationQueries)
      .map(m => m.queries.keys.toSeq)
    val all = perModule.flatten
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.toSeq.sorted}")
    assert(all.size == SparkEntry.queries.size)
  }
}
