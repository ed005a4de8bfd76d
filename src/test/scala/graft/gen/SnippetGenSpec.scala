package graft.gen

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ddl.DorisDdl
import graft.genrule.GenRules

/** G9 `scala` user-code generator (reference: src/generator/golang.go —
  * a runtime-evaluated snippet; here a ToolBox-compiled Scala literal
  * behind the allowUserCode opt-in). */
class SnippetGenSpec extends SparkSpec {

  private val ddl = """
    CREATE TABLE `t` (
      `id` bigint NOT NULL,
      `code` varchar(32) NULL,
      `num` bigint NULL
    ) ENGINE=OLAP"""
  private lazy val table = DorisDdl.parseCreateTable(ddl)

  private def withUserCode[A](f: => A): A = {
    spark.conf.set(SnippetGen.EnableKey, "true")
    try f finally spark.conf.unset(SnippetGen.EnableKey)
  }

  test("snippet compiles once per JVM and is a pure function of the row id") {
    withUserCode {
      val conf = GenRules.parseYaml("""
        tables:
          - name: t
            row_count: 30
            columns:
              - name: code
                gen:
                  scala: "(idx: Long) => \"user_\" + (idx % 3)"
              - name: num
                gen:
                  scala: "(idx: Long) => idx * 2 + 1"
      """)
      val env = GenRules.buildEnv(conf)
      val df = TableGen.frame(spark, table, rows = 30, seed = 1, env)
      val rows = df.collect()
      assert(rows.length == 30)
      // deterministic, idx-derived values with the declared types applied;
      // both snippets see the SAME row idx, so the columns must agree
      assert(rows.map(_.getLong(2)).sorted.toSeq ==
        (0 until 30).map(i => i * 2L + 1))
      rows.foreach { r =>
        val idx = (r.getLong(2) - 1) / 2
        assert(r.getString(1) == s"user_${idx % 3}")
      }
    }
  }

  test("user code is OFF by default and a bad snippet fails at build time") {
    val err = intercept[IllegalArgumentException] {
      SnippetGen.column("(idx: Long) => idx")
    }
    assert(err.getMessage.contains(SnippetGen.EnableKey))
    withUserCode {
      val bad = intercept[IllegalArgumentException] {
        SnippetGen.column("(idx: Long) => nonexistent(idx)")
      }
      assert(bad.getMessage.contains("failed to compile"))
    }
  }

  test("faker-tag registry covers the reference README's full tag table") {
    // fixture = the 264 tag names from the reference's documented table
    // (src/generator/README.md); the registry must resolve every one
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixture/faker_tags_readme.txt"))
    val tags = try src.getLines().map(_.trim).filter(_.nonEmpty).toVector
               finally src.close()
    assert(tags.size == 264)
    val ctx = ColumnGen.Ctx(7L, "t", Seq(col("id")))
    val unknown = tags.filterNot(t => ColumnGen.fakerTag(t, 0, ctx).isDefined)
    assert(unknown.isEmpty, s"tags missing from the registry: $unknown")
    // every tag's Column must also MATERIALIZE (catches bad expressions,
    // not just missing cases) — all 264 in one projection pass
    val cols = tags.zipWithIndex.map { case (t, i) =>
      ColumnGen.fakerTag(t, 0, ctx).get.cast("string").as(s"c$i") }
    val rows = spark.range(5).select(cols: _*).collect()
    assert(rows.length == 5)
    tags.indices.foreach { i =>
      assert(rows.forall(_.getString(i) != null), s"tag ${tags(i)} produced null")
    }
  }

  test("null result renders as SQL NULL") {
    withUserCode {
      val df = spark.range(4).select(col("id"),
        SnippetGen.column("(idx: Long) => if (idx % 2 == 0) null else idx")
          .cast("string").as("v"))
      val vs = df.orderBy("id").collect().map(r => Option(r.getString(1)))
      assert(vs.toSeq == Seq(None, Some("1"), None, Some("3")))
    }
  }
}
