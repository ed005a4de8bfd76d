package graft.anon

import graft.SparkSpec

/** N5: the consistency invariant — same identifier (case-insensitive) →
  * same alias across schema, stats and queries, and anonymized queries
  * still parse against anonymized schemas (reference:
  * src/anonymizer.go:112-116, src/parser/custom_test.go:10-38).
  * Property-style: 200 seeded random schema/query pairs. */
class AnonPropertySpec extends SparkSpec {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randIdent(r: scala.util.Random): String = {
    val n = 3 + r.nextInt(10)
    val chars = "abcdefghijklmnopqrstuvwxyz_"
    (1 to n).map(_ => chars(r.nextInt(chars.length))).mkString
  }

  test("anonymized query still parses against the anonymized schema") {
    for (seed <- 1 to 200) {
      val r = rng(seed)
      val table = randIdent(r)
      val cols = Seq.fill(2 + r.nextInt(4))(randIdent(r)).distinct
      val method = if (seed % 2 == 0) "hash" else "minihash"
      val ctx = new Anonymizer.Context(method = method)

      val ddl = s"CREATE TABLE $table (${cols.map(c => s"$c bigint").mkString(", ")})"
      val query = s"SELECT ${cols.head}, count(*) FROM $table " +
        s"WHERE ${cols.last} > ${r.nextInt(100)} GROUP BY ${cols.head}"

      val aDdl = Anonymizer.anonymizeSql(ctx, ddl)
      val aQuery = Anonymizer.anonymizeSql(ctx, query)

      // consistency: every column alias in the DDL appears in the query
      // rewrite wherever the original appeared
      val tAlias = ctx.anonymize(table)
      assert(aDdl.contains(tAlias) && aQuery.contains(tAlias),
        s"seed=$seed: table alias inconsistent\n$aDdl\n$aQuery")
      assert(aQuery.contains(ctx.anonymize(cols.head)), s"seed=$seed")

      // validity: both rewrites still parse in the engine
      spark.sessionState.sqlParser.parsePlan(aDdl.replace("bigint", "BIGINT"))
      spark.sessionState.sqlParser.parsePlan(aQuery)

      // case-insensitive: SELECT with different case gets the same alias
      val upper = Anonymizer.anonymizeSql(ctx, s"SELECT ${cols.head.toUpperCase} FROM ${table.toUpperCase}")
      assert(upper.contains(tAlias), s"seed=$seed: case-insensitive alias broke")
    }
  }

  test("no minihash alias is a grammar keyword") {
    // Exhaust the alias sequence well past the 1-3 letter space (26 +
    // 676 + 17576) — the dictionary must skip every keyword literal of
    // the public grammar, or an unquoted alias like `by`/`add`/`row`
    // changes how replayed SQL parses (N5).
    val ctx = new Anonymizer.Context(method = "minihash")
    val aliases = (1 to 20000).map(i => ctx.anonymize(s"ident_$i"))
    assert(aliases.distinct.size == aliases.size, "aliases must be unique")
    val bad = aliases.filter(a =>
      Anonymizer.Keywords.contains(a) || DorisKeywords.All.contains(a))
    assert(bad.isEmpty, s"keyword aliases handed out: ${bad.take(10)}")
    // the short grammar keywords are all demonstrably within the
    // exhausted prefix, so they were skipped, not just unreached
    val twoLetter = Seq("as", "at", "by", "do", "if", "in", "is", "no",
      "of", "on", "or", "pi", "to", "up")
    assert(twoLetter.forall(DorisKeywords.All.contains), "sanity: grammar list")
    assert(twoLetter.forall(w => !aliases.contains(w)))
  }

  test("hashAliasCol (codegen'd Column) is value-identical to hashAlias (driver)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (1 to 50).map(i => randIdent(rng(i))) ++
      Seq("mysql", "GLOBAL", "information_schema", "ab", "x", null,
        "MiXeD_Case", "__internal_schema")
    val got = ids.toDF("id")
      .select(col("id"), Anonymizer.hashAliasCol(col("id")).as("alias"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (id, alias) =>
      assert(alias == Anonymizer.hashAlias(id), s"id=$id")
    }
  }

  test("idempotence: identity rewrite preserves the statement (modulo backtick strip)") {
    for (seed <- 1 to 50) {
      val r = rng(seed + 1000)
      val t = randIdent(r)
      val c = randIdent(r)
      val sql = s"SELECT $c, sum($c + 1) FROM $t WHERE $c LIKE 'x%' GROUP BY `$c`"
      // backticks are stripped by design (reference ToSQL parity)
      assert(Anonymizer.anonymizeSqlWith(identity, sql) == sql.replace("`", ""), s"seed=$seed")
    }
  }
}
