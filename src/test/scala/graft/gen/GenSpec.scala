package graft.gen

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ddl.DorisDdl
import graft.genrule.{ColumnStats, GenRules, TableStats}

/** End-to-end generator tests over a synthesized all-types schema
  * (mirrors the coverage of the reference's gendata e2e test,
  * reference: src/gendata_test.go:18-116 — schema synthesized, not copied). */
class GenSpec extends SparkSpec {

  private val allTypesDdl = """
    CREATE TABLE `every_type` (
      `k_inc` bigint NOT NULL,
      `a_bool` boolean NULL,
      `a_tiny` tinyint NULL,
      `a_small` smallint NULL,
      `a_int` int NULL,
      `a_big` bigint NULL,
      `a_large` largeint NULL,
      `a_float` float NULL,
      `a_double` double NULL,
      `d_2_1` decimal(2,1) NULL,
      `d_8_4` decimal(8,4) NULL,
      `d_18_8` decimal(18,8) NULL,
      `d_38_16` decimal(38,16) NULL,
      `t_date` date NULL,
      `t_dt` datetime NULL,
      `s_char` char(10) NULL,
      `s_varchar` varchar(24) NULL,
      `s_text` text NULL,
      `j_json` json NULL,
      `b_bitmap` bitmap NOT NULL,
      `h_hll` hll NULL,
      `ip4` ipv4 NULL,
      `ip6` ipv6 NULL,
      `arr_i` array<int> NULL,
      `map_si` map<varchar(8), int> NULL,
      `st` struct<f1:bigint, f2:text> NULL,
      `nested` map<text, array<struct<x:int>>> NULL
    ) ENGINE=OLAP"""

  private lazy val table = DorisDdl.parseCreateTable(allTypesDdl)
  private lazy val env = GenRules.buildEnv(GenRules.empty)

  test("generates every type with the declared Spark schema") {
    val df = TableGen.frame(spark, table, rows = 200, seed = 42, env)
    assert(df.schema.fields.map(_.name).toSeq == table.columns.map(_.name))
    assert(df.schema("d_38_16").dataType.typeName == "decimal(38,16)")
    assert(df.count() == 200)
    // nothing throws on materialization of every column
    assert(df.collect().length == 200)
  }

  test("inc generator: exact contiguous sequence, start/step honored") {
    val conf = GenRules.parseYaml("""
      tables:
        - name: every_type
          row_count: 50
          columns:
            - name: k_inc
              gen: {inc: 3, start: 100}
      """)
    val env2 = GenRules.buildEnv(conf)
    val df = TableGen.frame(spark, table, 50, 7, env2).select("k_inc")
    val vals = df.orderBy("k_inc").collect().map(_.getLong(0)).toSeq
    assert(vals == (0 until 50).map(i => 100L + 3L * i))
  }

  test("null_frequency ~ respected and NOT NULL forces zero nulls") {
    val conf = GenRules.parseYaml("""
      tables:
        - name: every_type
          columns:
            - name: a_int
              null_frequency: 0.4
      """)
    val env2 = GenRules.buildEnv(conf)
    val df = TableGen.frame(spark, table, 5000, 1, env2)
    val nNullInt = df.filter(col("a_int").isNull).count()
    assert(math.abs(nNullInt / 5000.0 - 0.4) < 0.05, s"got ${nNullInt / 5000.0}")
    assert(df.filter(col("k_inc").isNull).count() == 0)   // NOT NULL
    assert(df.filter(col("b_bitmap").isNull).count() == 0) // bitmap never null
  }

  test("min/max bounds and string length bounds hold") {
    val conf = GenRules.parseYaml("""
      type:
        int: {min: 10, max: 20}
      tables:
        - name: every_type
          columns:
            - name: s_varchar
              length: {min: 3, max: 8}
            - name: t_date
              min: 2020-01-01
              max: 2020-12-31
      """)
    val env2 = GenRules.buildEnv(conf)
    val df = TableGen.frame(spark, table, 2000, 2, env2).cache()
    try {
      assert(df.filter(col("a_int") < 10 || col("a_int") > 20).count() == 0)
      assert(df.filter(length(col("s_varchar")) < 3 || length(col("s_varchar")) > 8).count() == 0)
      assert(df.filter(col("t_date") < "2020-01-01" || col("t_date") > "2020-12-31").count() == 0)
      assert(df.filter(length(col("s_char")) =!= 10).count() == 0) // CHAR fixed len
      // decimal(2,1): |v| < 10
      assert(df.filter(abs(col("d_2_1")) >= 10).count() == 0)
    } finally df.unpersist()
  }

  test("weighted enum: distribution matches weights, values from the set") {
    val conf = GenRules.parseYaml("""
      tables:
        - name: every_type
          columns:
            - name: s_text
              gen:
                enum: [alpha, beta, gamma]
                weights: [0.6, 0.3, 0.1]
      """)
    val env2 = GenRules.buildEnv(conf)
    val df = TableGen.frame(spark, table, 10000, 3, env2)
    val counts = df.groupBy("s_text").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("alpha", "beta", "gamma"))
    assert(math.abs(counts("alpha") / 10000.0 - 0.6) < 0.05)
    assert(math.abs(counts("beta") / 10000.0 - 0.3) < 0.05)
    assert(math.abs(counts("gamma") / 10000.0 - 0.1) < 0.02)
  }

  test("generation is deterministic and partitioning-independent") {
    def digest(df: org.apache.spark.sql.DataFrame): Long =
      df.select(xxhash64(col("a_int"), col("s_varchar"), col("d_8_4")).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    val h1 = digest(TableGen.frame(spark, table, 500, 99, env))
    val h2 = digest(TableGen.frame(spark, table, 500, 99, env).repartition(13))
    assert(h1 == h2)
    val h3 = digest(TableGen.frame(spark, table, 500, 100, env))
    assert(h1 != h3) // different seed → different data
  }

  test("stats-driven rules: null rate + numeric bounds from ColumnStats") {
    val stats = TableStats("every_type", rowCount = 100, columns = Seq(
      ColumnStats("a_int", count = 100, nullCount = 50, min = "5", max = "7"),
      ColumnStats("s_text", count = 100, avgSizeByte = 12, min = "ab", max = "abcdef")))
    val df = TableGen.frame(spark, table, 4000, 4, env, Some(stats)).cache()
    try {
      assert(df.filter(col("a_int") < 5 || col("a_int") > 7).count() == 0)
      val nullRate = df.filter(col("a_int").isNull).count() / 4000.0
      assert(math.abs(nullRate - 0.5) < 0.05, s"got $nullRate")
      // avg 12 with differing min/max lengths → length in [2, 22] (±10 hack)
      assert(df.filter(col("s_text").isNotNull &&
        (length(col("s_text")) < 2 || length(col("s_text")) > 22)).count() == 0)
    } finally df.unpersist()
  }

  test("CSV sink: star separator, \\N nulls, JSON complex values") {
    val conf = GenRules.parseYaml("""
      tables:
        - name: every_type
          columns: [{name: a_int, null_frequency: 0.5}]
      """)
    val env2 = GenRules.buildEnv(conf)
    val df = TableGen.frame(spark, table, 100, 5, env2)
      .select("k_inc", "a_int", "a_bool", "arr_i", "st")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    TableGen.writeCsv(df, dir, rowsPerFile = 30)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = files.flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    assert(lines.length == 100)
    assert(lines.forall(_.count(_ == '☆') == 4))
    assert(lines.exists(_.contains("\\N")))          // nulls present at 50%
    assert(lines.forall(l => l.contains("[") && l.contains("{"))) // JSON complex
  }

  test("stream-load mapping emitted only for bitmap/hll") {
    val m = TableGen.streamLoadMapping(table, env)
    assert(m.isDefined)
    assert(m.get.startsWith("columns: "))
    assert(m.get.contains("bitmap_from_array(cast(raw_b_bitmap as ARRAY<BIGINT(20)>))"))
    assert(m.get.contains("`h_hll`=hll_empty()"))
    val plain = DorisDdl.parseCreateTable("CREATE TABLE p (a int, b text)")
    assert(TableGen.streamLoadMapping(plain, env).isEmpty)
  }
}
