package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.ddl.DorisDdl
import graft.gen.TableGen
import graft.genrule.{ColumnStats, GenRules, TableStats}

/** Gendata engine as driver-checkable operators (SURVEY.md §2.8 G1–G4,
  * G10–G11): each query parses Doris DDL, generates a seeded deterministic
  * DataFrame, lands it as parquet, and returns aggregates over the landed
  * file; the DuckDB oracle recomputes the same aggregates from the same
  * parquet — verifying DDL→schema, value bounds, null rates, inc
  * sequences and enum weights end-to-end through independent readers.
  */
object GendataQueries extends QueryModule {

  private val outRoot = "/tmp/graft_gendata"

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
      FROM read_parquet('$outRoot/emp/*.parquet')"""
  )
}
