package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.ddl.DorisDdl
import graft.gen.{GenPlanner, TableGen}
import graft.genrule.{ColumnStats, GenRules, TableStats}

/** Gendata engine as driver-checkable operators (SURVEY.md §2.8 G1–G4,
  * G10–G11): each query parses Doris DDL, generates a seeded deterministic
  * DataFrame, lands it as parquet, and returns aggregates over the landed
  * file; the DuckDB oracle recomputes the same aggregates from the same
  * parquet — verifying DDL→schema, value bounds, null rates, inc
  * sequences and enum weights end-to-end through independent readers.
  */
object GendataQueries extends QueryModule {

  private val outRoot = s"${graft.Land.root}/gendata"

  private def landAndRead(s: SparkSession, df: DataFrame, name: String): DataFrame = {
    val path = s"$outRoot/$name"
    df.write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- G1 type generators + G11 merge over an all-types DDL ----------
    "g01_gendata_types" -> ((s, _) => {
      val table = DorisDdl.parseCreateTable("""
        CREATE TABLE typed (
          id bigint NOT NULL,
          v_int int NULL,
          v_dec decimal(12,4) NULL,
          v_date date NULL,
          v_str varchar(16) NULL,
          v_arr array<smallint> NULL
        )""")
      val conf = GenRules.parseYaml("""
        type:
          int: {min: -50, max: 50}
          date: {min: 2021-03-01, max: 2021-09-30}
        tables:
          - name: typed
            row_count: 20000
            columns:
              - {name: id, gen: {inc: 1, start: 1}}
              - {name: v_str, length: {min: 4, max: 12}, null_frequency: 0.2}
              - {name: v_dec, min: -999, max: 999}
        """)
      val env = GenRules.buildEnv(conf)
      val gen = TableGen.frame(s, table, TableGen.rowCount(table, env), seed = 11, env)
      val landed = landAndRead(s, gen, "typed")
      landed.agg(
        count(lit(1)).as("n"),
        min(col("id")).as("id_min"),
        max(col("id")).as("id_max"),
        min(col("v_int")).as("i_min"),
        max(col("v_int")).as("i_max"),
        sum(when(col("v_str").isNull, 1).otherwise(0)).as("n_null_str"),
        min(length(col("v_str"))).cast("long").as("len_min"),
        max(length(col("v_str"))).cast("long").as("len_max"),
        min(col("v_date")).as("d_min"),
        max(col("v_date")).as("d_max"),
        max(abs(col("v_dec"))).cast("double").as("dec_absmax"),
        max(size(col("v_arr"))).cast("long").as("arr_maxlen"))
    }),

    // ---- G4 weighted enum + G3 inc: value-level distribution -----------
    "g02_gendata_enum_weights" -> ((s, _) => {
      val table = DorisDdl.parseCreateTable(
        "CREATE TABLE ev (seq bigint NOT NULL, grade varchar(8) NOT NULL)")
      val conf = GenRules.parseYaml("""
        tables:
          - name: ev
            row_count: 50000
            columns:
              - {name: seq, gen: {inc: 2, start: 10}}
              - name: grade
                gen:
                  enum: [gold, silver, bronze]
                  weights: [0.2, 0.3, 0.5]
        """)
      val env = GenRules.buildEnv(conf)
      val gen = TableGen.frame(s, table, TableGen.rowCount(table, env), seed = 12, env)
      val landed = landAndRead(s, gen, "ev")
      landed.groupBy(col("grade"))
        .agg(count(lit(1)).as("n"),
             min(col("seq")).as("seq_min"),
             max(col("seq")).as("seq_max"))
        .orderBy("grade")
    }),

    // ---- stats-driven rules (A2 consumption path) ----------------------
    "g03_gendata_stats_driven" -> ((s, _) => {
      val table = DorisDdl.parseCreateTable("""
        CREATE TABLE emp (
          employee_id int NOT NULL,
          department_id int NULL,
          salary decimal(10,2) NULL
        )""")
      val stats = TableStats("emp", rowCount = 8, columns = Seq(
        ColumnStats("department_id", count = 8, nullCount = 2, min = "10", max = "30"),
        ColumnStats("salary", count = 8, nullCount = 0, min = "15000", max = "16000")))
      val env = GenRules.buildEnv(GenRules.parseYaml(
        "tables: [{name: emp, row_count: 30000, columns: [{name: employee_id, gen: {inc: 1}}]}]"))
      val gen = TableGen.frame(s, table, TableGen.rowCount(table, env), seed = 13, env, Some(stats))
      val landed = landAndRead(s, gen, "emp")
      landed.agg(
        count(lit(1)).as("n"),
        max(col("employee_id")).as("id_max"),
        min(col("department_id")).as("dept_min"),
        max(col("department_id")).as("dept_max"),
        sum(when(col("department_id").isNull, 1).otherwise(0)).as("n_null_dept"),
        min(col("salary")).cast("double").as("sal_min"),
        max(col("salary")).cast("double").as("sal_max"))
    }),

    // ---- G5 ref correlation + topo scheduling --------------------------
    "g04_gendata_ref" -> ((s, _) => {
      val dim = DorisDdl.parseCreateTable(
        "CREATE TABLE dim (dep_id int NOT NULL, dep_name varchar(16) NOT NULL)")
      val fact = DorisDdl.parseCreateTable(
        "CREATE TABLE fact (row_id bigint NOT NULL, dep_ref int NOT NULL)")
      val conf = GenRules.parseYaml("""
        tables:
          - name: dim
            row_count: 40
            columns:
              - {name: dep_id, gen: {inc: 3, start: 100}}
          - name: fact
            row_count: 20000
            columns:
              - {name: row_id, gen: {inc: 1}}
              - {name: dep_ref, gen: {ref: dim.dep_id, limit: 25}}
        """)
      val env = GenRules.buildEnv(conf)
      // deliberately pass fact first: the planner must topo-order
      val frames = GenPlanner.generateAll(s, Seq(fact, dim), env, seed = 14)
      frames("dim").write.mode("overwrite").parquet(s"$outRoot/ref_dim")
      frames("fact").write.mode("overwrite").parquet(s"$outRoot/ref_fact")
      val dimL = s.read.parquet(s"$outRoot/ref_dim")
      val factL = s.read.parquet(s"$outRoot/ref_fact")
      // every fact ref must hit a dim key; ≤25 distinct values drawn
      factL.join(dimL, factL("dep_ref") === dimL("dep_id"), "left")
        .agg(
          count(lit(1)).as("n_fact"),
          sum(when(dimL("dep_id").isNull, 1L).otherwise(0L)).as("n_orphans"),
          countDistinct(factL("dep_ref")).as("ndv_ref"))
    }),

    // ---- G6/G7/G8/G9: parts+format, faker tags, type subst, expr -------
    "g05_gendata_format" -> ((s, _) => {
      val table = DorisDdl.parseCreateTable("""
        CREATE TABLE fmt (
          id bigint NOT NULL,
          sku varchar(32) NOT NULL,
          email varchar(64) NOT NULL,
          month_code char(7) NOT NULL,
          as_int_str varchar(8) NOT NULL,
          from_expr bigint NOT NULL
        )""")
      val conf = GenRules.parseYaml("""
        tables:
          - name: fmt
            row_count: 10000
            columns:
              - {name: id, gen: {inc: 1}}
              - name: sku
                format: "SKU-{{%05d}}-{{%s}}"
                gen:
                  parts:
                    - {type: int, min: 1, max: 99999}
                    - {type: "char(3)"}
              - {name: email, format: "{{username}}@{{domainname}}"}
              - name: month_code
                format: "{{year}}-{{%02d}}"
                gen: {type: tinyint, min: 1, max: 12}
              - {name: as_int_str, gen: {type: int, min: 1000, max: 9999}}
              - {name: from_expr, gen: {expr: "id * 10 + 7"}}
        """)
      val env = GenRules.buildEnv(conf)
      val gen = TableGen.frame(s, table, TableGen.rowCount(table, env), seed = 15, env)
      val landed = landAndRead(s, gen, "fmt")
      landed.agg(
        count(lit(1)).as("n"),
        sum(when(regexp_like(col("sku"), lit("^SKU-[0-9]{5}-[a-zA-Z0-9]{3}$")), 1L).otherwise(0L)).as("n_sku_ok"),
        sum(when(regexp_like(col("email"), lit("^[a-z]+[0-9]+@[a-z.]+$")), 1L).otherwise(0L)).as("n_email_ok"),
        sum(when(regexp_like(col("month_code"), lit("^(19|20)[0-9]{2}-(0[1-9]|1[0-2])$")), 1L).otherwise(0L)).as("n_month_ok"),
        min(col("as_int_str").cast("int")).as("int_str_min"),
        max(col("as_int_str").cast("int")).as("int_str_max"),
        sum(when(col("from_expr") % 10 === lit(7), 1L).otherwise(0L)).as("n_expr_ok"))
    }),

    // ---- G9 full user-code generator: a runtime-compiled Scala snippet
    //      (SnippetGen); the oracle recomputes the snippet's semantics
    //      independently from range(), so the whole compile-ship-execute
    //      path is what's under test ---------------------------------------
    "g06_gendata_scala" -> ((s, _) => {
      val table = DorisDdl.parseCreateTable("""
        CREATE TABLE usercode (
          id bigint NOT NULL,
          code varchar(16) NOT NULL,
          num bigint NOT NULL
        )""")
      val conf = GenRules.parseYaml("""
        tables:
          - name: usercode
            row_count: 1000
            columns:
              - {name: id, gen: {inc: 1}}
              - name: code
                gen: {scala: '(idx: Long) => "grp_" + (idx % 7)'}
              - name: num
                gen: {scala: '(idx: Long) => idx * idx % 101'}
        """)
      val env = GenRules.buildEnv(conf)
      s.conf.set(graft.gen.SnippetGen.EnableKey, "true")
      val landed = try {
        val gen = TableGen.frame(s, table, TableGen.rowCount(table, env), seed = 16, env)
        landAndRead(s, gen, "usercode")
      } finally s.conf.unset(graft.gen.SnippetGen.EnableKey)
      landed.agg(
        count(lit(1)).as("n"),
        countDistinct(col("code")).as("n_codes"),
        sum(col("num")).as("sum_num"),
        max(col("num")).as("max_num"),
        // inc id = snippet idx + 1 links the two generators row-by-row
        sum(when(col("code") === concat(lit("grp_"),
          ((col("id") - 1) % 7).cast("string")), 1L).otherwise(0L)).as("n_linked"))
    })
  )

  val oracles: Map[String, String] = Map(
    "g01_gendata_types" -> s"""
      SELECT COUNT(*) AS n,
             MIN(id) AS id_min, MAX(id) AS id_max,
             MIN(v_int) AS i_min, MAX(v_int) AS i_max,
             CAST(SUM(CASE WHEN v_str IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_str,
             MIN(LENGTH(v_str)) AS len_min, MAX(LENGTH(v_str)) AS len_max,
             MIN(v_date) AS d_min, MAX(v_date) AS d_max,
             CAST(MAX(ABS(v_dec)) AS DOUBLE) AS dec_absmax,
             CAST(MAX(LEN(v_arr)) AS BIGINT) AS arr_maxlen
      FROM read_parquet('$outRoot/typed/*.parquet')""",

    "g02_gendata_enum_weights" -> s"""
      SELECT grade, COUNT(*) AS n, MIN(seq) AS seq_min, MAX(seq) AS seq_max
      FROM read_parquet('$outRoot/ev/*.parquet')
      GROUP BY grade ORDER BY grade""",

    "g03_gendata_stats_driven" -> s"""
      SELECT COUNT(*) AS n,
             MAX(employee_id) AS id_max,
             MIN(department_id) AS dept_min, MAX(department_id) AS dept_max,
             CAST(SUM(CASE WHEN department_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_dept,
             CAST(MIN(salary) AS DOUBLE) AS sal_min,
             CAST(MAX(salary) AS DOUBLE) AS sal_max
      FROM read_parquet('$outRoot/emp/*.parquet')""",

    "g04_gendata_ref" -> s"""
      SELECT COUNT(*) AS n_fact,
             CAST(SUM(CASE WHEN d.dep_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
             COUNT(DISTINCT f.dep_ref) AS ndv_ref
      FROM read_parquet('$outRoot/ref_fact/*.parquet') f
      LEFT JOIN read_parquet('$outRoot/ref_dim/*.parquet') d
        ON f.dep_ref = d.dep_id""",

    "g05_gendata_format" -> s"""
      SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN regexp_matches(sku, '^SKU-[0-9]{5}-[a-zA-Z0-9]{3}$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_sku_ok,
             CAST(SUM(CASE WHEN regexp_matches(email, '^[a-z]+[0-9]+@[a-z.]+$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_email_ok,
             CAST(SUM(CASE WHEN regexp_matches(month_code, '^(19|20)[0-9]{2}-(0[1-9]|1[0-2])$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_month_ok,
             MIN(CAST(as_int_str AS INT)) AS int_str_min,
             MAX(CAST(as_int_str AS INT)) AS int_str_max,
             CAST(SUM(CASE WHEN from_expr % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_expr_ok
      FROM read_parquet('$outRoot/fmt/*.parquet')""",

    "g06_gendata_scala" -> """
      WITH g AS (SELECT CAST(i + 1 AS BIGINT) AS id,
                        'grp_' || CAST(i % 7 AS VARCHAR) AS code,
                        CAST(i * i % 101 AS BIGINT) AS num
                 FROM range(1000) t(i))
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT code) AS n_codes,
             CAST(SUM(num) AS BIGINT) AS sum_num,
             CAST(MAX(num) AS BIGINT) AS max_num,
             CAST(SUM(CASE WHEN code = 'grp_' || CAST((id - 1) % 7 AS VARCHAR)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_linked
      FROM g"""
  )
}
