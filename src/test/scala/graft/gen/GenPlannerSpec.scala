package graft.gen

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ddl.DorisDdl
import graft.genrule.GenRules

/** ref topology, parts+format splicing, faker tags, type substitution and
  * the expr escape hatch (mirrors the coverage of the reference's
  * ref/parts/format/type generator tests — reference: src/generator/
  * ref_test.go, parts_test.go, format_test.go, type_test.go). */
class GenPlannerSpec extends SparkSpec {

  test("ref: fact values drawn only from generated dim; tables topo-ordered") {
    val dim = DorisDdl.parseCreateTable(
      "CREATE TABLE d (k int NOT NULL)")
    val fact = DorisDdl.parseCreateTable(
      "CREATE TABLE f (fk int NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml("""
      tables:
        - name: d
          row_count: 10
          columns: [{name: k, gen: {inc: 5, start: 1000}}]
        - name: f
          row_count: 2000
          columns: [{name: fk, gen: {ref: d.k, limit: 6}}]
      """))
    val frames = GenPlanner.generateAll(spark, Seq(fact, dim), env, seed = 7)
    val dimKeys = frames("d").collect().map(_.getInt(0)).toSet
    val factVals = frames("f").select("fk").collect().map(_.getInt(0)).toSet
    assert(dimKeys == (0 until 10).map(1000 + _ * 5).toSet)
    assert(factVals.subsetOf(dimKeys))
    assert(factVals.size <= 6) // reservoir limit respected
    assert(factVals.size >= 2) // and actually varied
  }

  test("ref: missing table and cycles error out") {
    val f = DorisDdl.parseCreateTable("CREATE TABLE f (fk int NOT NULL)")
    val envMissing = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: f, columns: [{name: fk, gen: {ref: nosuch.k}}]}]"))
    val e1 = intercept[IllegalArgumentException] {
      GenPlanner.generateAll(spark, Seq(f), envMissing, seed = 1)
    }
    assert(e1.getMessage.contains("nosuch"))

    val a = DorisDdl.parseCreateTable("CREATE TABLE a (x int NOT NULL)")
    val b = DorisDdl.parseCreateTable("CREATE TABLE b (y int NOT NULL)")
    val envCycle = GenRules.buildEnv(GenRules.parseYaml("""
      tables:
        - {name: a, columns: [{name: x, gen: {ref: b.y}}]}
        - {name: b, columns: [{name: y, gen: {ref: a.x}}]}
      """))
    val e2 = intercept[IllegalArgumentException] {
      GenPlanner.generateAll(spark, Seq(a, b), envCycle, seed = 1)
    }
    assert(e2.getMessage.toLowerCase.contains("deadlock"))
  }

  test("parts+format: k parts spliced into k verb tags in order") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE p (code varchar(32) NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml("""
      tables:
        - name: p
          row_count: 300
          columns:
            - name: code
              format: "{{%s}}--{{%03d}}"
              gen:
                parts:
                  - "prefix"
                  - {type: int, min: 1, max: 999}
      """))
    val vals = TableGen.frame(spark, t, 300, seed = 8, env)
      .collect().map(_.getString(0))
    assert(vals.forall(_.matches("^prefix--[0-9]{3}$")))
    assert(vals.distinct.length > 10) // the int part actually varies
  }

  test("parts without format errors (reference parity)") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE p (code varchar(32) NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: p, columns: [{name: code, gen: {parts: [x]}}]}]"))
    val e = intercept[IllegalArgumentException] {
      TableGen.frame(spark, t, 10, seed = 8, env).collect()
    }
    assert(e.getMessage.contains("format"))
  }

  test("format: faker tags deterministic per seed, unknown tag errors") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE u (m varchar(32) NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: u, row_count: 50, columns: [{name: m, format: \"{{month}} {{year}}\"}]}]"))
    val run1 = TableGen.frame(spark, t, 50, seed = 9, env).collect().map(_.getString(0))
    val run2 = TableGen.frame(spark, t, 50, seed = 9, env).collect().map(_.getString(0))
    assert(run1.toSeq == run2.toSeq)
    assert(run1.forall(_.matches("^[A-Z][a-z]+ (19|20)[0-9]{2}$")))

    val bad = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: u, columns: [{name: m, format: \"{{nosuchtag}}\"}]}]"))
    val e = intercept[IllegalArgumentException] {
      TableGen.frame(spark, t, 10, seed = 9, bad).collect()
    }
    assert(e.getMessage.contains("unknown format tag"))
  }

  test("snake_case faker registry: shaped values, deterministic, broad") {
    def gen(fmt: String, n: Int = 40): Array[String] = {
      val t = DorisDdl.parseCreateTable("CREATE TABLE u (m varchar(255) NOT NULL)")
      val env = GenRules.buildEnv(GenRules.parseYaml(
        s"""tables: [{name: u, row_count: $n, columns: [{name: m, format: "$fmt"}]}]"""))
      TableGen.frame(spark, t, n, seed = 3, env).collect().map(_.getString(0))
    }
    assert(gen("{{ssn}}").forall(_.matches("""\d{3}-\d{2}-\d{4}""")))
    assert(gen("{{mac_address}}").forall(_.matches("""([0-9a-f]{2}:){5}[0-9a-f]{2}""")))
    assert(gen("{{hex_color}}").forall(_.matches("""#[0-9a-f]{6}""")))
    assert(gen("{{http_status_code}}").forall(s => Set("200", "201", "204", "301",
      "302", "400", "401", "403", "404", "500", "502", "503")(s)))
    assert(gen("{{date}}").forall(_.matches("""20(1[6-9]|2[0-5])-\d{2}-\d{2}""")))
    assert(gen("{{credit_card_exp}}").forall(_.matches("""(0[1-9]|1[0-2])/(2[6-9]|3[0-3])""")))
    assert(gen("{{latitude}}").forall(s => math.abs(s.toDouble) <= 90))
    assert(gen("{{longitude}}").forall(s => math.abs(s.toDouble) <= 180))
    assert(gen("{{phone_formatted}}").forall(_.matches("""\(\d{3}\) \d{3}-\d{4}""")))
    assert(gen("{{street}}").forall(_.matches("""\d+ [A-Z][a-z]+ [A-Z][a-z]+ [A-Za-z]+""")))
    assert(gen("{{bool}}").forall(s => s == "true" || s == "false"))
    assert(gen("{{int_8}}").forall(s => { val v = s.toInt; v >= -128 && v <= 127 }))
    assert(gen("{{uint_16}}").forall(s => { val v = s.toInt; v >= 0 && v <= 65535 }))
    // every word-list tag yields a non-empty value from its list domain
    val wordTags = Seq("first_name", "last_name", "name_prefix", "name_suffix",
      "gender", "job_title", "company", "company_suffix", "buzz_word", "noun",
      "verb", "adjective", "adverb", "preposition", "vowel", "state_abr",
      "street_prefix", "street_suffix", "time_zone", "language",
      "language_abbreviation", "domain_name", "domain_suffix", "http_method",
      "http_version", "user_agent", "file_extension", "file_mime_type",
      "app_name", "programming_language", "safe_color", "flip_a_coin",
      "month_string", "week_day", "currency_short", "dog", "cat", "bird",
      "farm_animal", "pet_name", "dessert", "snack", "breakfast", "lunch",
      "dinner", "drink", "hobby", "emoji", "lorem_ipsum_word", "gamertag",
      "bs", "slogan", "phrase", "sentence_simple", "street_name",
      "street_number", "past_date", "credit_card_cvv", "middle_name",
      "int_16", "int_32", "int_64", "uint_8", "uint_32")
    for (tag <- wordTags) {
      val vs = gen(s"{{$tag}}", 10)
      assert(vs.forall(_.nonEmpty), s"tag $tag produced empty values")
      assert(gen(s"{{$tag}}", 10).toSeq == vs.toSeq, s"tag $tag not deterministic")
    }
    // distinct draws per occurrence: two tags in one template differ sometimes
    val pairs = gen("{{first_name}}|{{first_name}}", 60)
    assert(pairs.exists(s => { val Array(a, b) = s.split('|'); a != b }))
  }

  test("format null propagation: NULL inner value formats to NULL") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE nf (v varchar(24) NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: nf, row_count: 2000, columns: [{name: v, format: \"v={{%s}}\", null_frequency: 0.5}]}]"))
    val rows = TableGen.frame(spark, t, 2000, seed = 10, env).collect().map(r =>
      Option(r.getString(0)))
    val nulls = rows.count(_.isEmpty)
    assert(nulls > 500 && nulls < 1500) // ~50%
    assert(rows.flatten.forall(_.startsWith("v=")))
  }

  test("type substitution: varchar rendered by int generator; struct to JSON") {
    val t = DorisDdl.parseCreateTable(
      "CREATE TABLE ts (n varchar(8) NOT NULL, j string NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml("""
      tables:
        - name: ts
          row_count: 500
          columns:
            - {name: n, gen: {type: int, min: 10, max: 99}}
            - {name: j, gen: {type: "struct<a:int, b:varchar(4)>"}}
      """))
    val rows = TableGen.frame(spark, t, 500, seed = 11, env).collect()
    assert(rows.forall(r => r.getString(0).matches("^[0-9]{2}$")))
    assert(rows.forall(r => r.getString(1).matches("""^\{"a":.*"b":.*\}$""")))
  }

  test("expr escape hatch is a pure function of the row id") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE ex (v bigint NOT NULL)")
    val env = GenRules.buildEnv(GenRules.parseYaml(
      "tables: [{name: ex, row_count: 100, columns: [{name: v, gen: {expr: \"id * id\"}}]}]"))
    val vals = TableGen.frame(spark, t, 100, seed = 12, env)
      .collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == (0L until 100L).map(i => i * i))
  }

  test("multi-document genconf generates one dataset per doc (G12)") {
    val t = DorisDdl.parseCreateTable("CREATE TABLE md (v int NOT NULL)")
    val yaml =
      """tables: [{name: md, row_count: 5, columns: [{name: v, gen: {inc: 1}}]}]
        |---
        |tables: [{name: md, row_count: 9, columns: [{name: v, gen: {inc: 2, start: 100}}]}]
        |""".stripMargin
    val ds = GenPlanner.generateDatasets(spark, Seq(t), yaml, seed = 13)
    assert(ds.length == 2)
    assert(ds(0)("md").count() == 5)
    assert(ds(1)("md").count() == 9)
    assert(ds(1)("md").agg(min(col("v"))).collect()(0).getInt(0) == 100)
  }
}
