package graft.sqlx

import org.scalatest.funsuite.AnyFunSuite

class DorisSqlSpec extends AnyFunSuite {

  test("LIMIT m,n -> LIMIT n OFFSET m") {
    assert(DorisSql.translate("SELECT a FROM t LIMIT 5, 10") ==
      "SELECT a FROM t LIMIT 10 OFFSET 5")
    // plain LIMIT untouched
    assert(DorisSql.translate("SELECT a FROM t LIMIT 10") ==
      "SELECT a FROM t LIMIT 10")
  }

  test("MINUS -> EXCEPT at top level, not inside strings") {
    assert(DorisSql.translate("SELECT a FROM t MINUS SELECT b FROM u") ==
      "SELECT a FROM t EXCEPT SELECT b FROM u")
    assert(DorisSql.translate("SELECT 'MINUS sign' FROM t") ==
      "SELECT 'MINUS sign' FROM t")
  }

  test("QUALIFY rewrite wraps window predicate") {
    val out = DorisSql.translate(
      "SELECT a, b FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b) = 1 ORDER BY a")
    assert(out.contains("SELECT * EXCEPT (__qualify)"))
    assert(out.contains("AS __qualify"))
    assert(out.contains("WHERE __qualify"))
    assert(out.trim.endsWith("ORDER BY a"))
    // no top-level QUALIFY -> untouched
    assert(DorisSql.translate("SELECT a FROM t WHERE a > 1") ==
      "SELECT a FROM t WHERE a > 1")
  }

  test("QUALIFY inside subquery is left for that level (depth-0 only)") {
    val sql = "SELECT * FROM (SELECT a FROM t) x WHERE a > 0"
    assert(DorisSql.translate(sql) == sql)
  }

  test("[broadcast]/[shuffle] distribute hints become Catalyst join hints") {
    val t = DorisSql.translate(
      "SELECT a.x FROM a JOIN [broadcast] dim d ON a.k = d.k JOIN [shuffle] big ON a.k = big.k")
    assert(t.contains("/*+ BROADCAST(d), SHUFFLE_HASH(big) */"), t)
    assert(!t.contains("["))
    // alias-less relation uses its table name, db prefix stripped
    val t2 = DorisSql.translate("SELECT * FROM a JOIN [broadcast] db1.dim ON a.k = dim.k")
    assert(t2.contains("/*+ BROADCAST(dim) */"), t2)
    // no hint, no change
    assert(DorisSql.translate("SELECT 1") == "SELECT 1")
  }
}
