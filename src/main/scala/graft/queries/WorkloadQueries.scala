package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.workload.{AuditLog, ReplayCodec}

/** Workload-extraction operators as driver-checkable queries (SURVEY.md
  * §2.1 S1–S3, §2.2 F1–F7): the DuckDB oracle independently re-parses the
  * same fixture files (regexp over record-start lines, JSON meta decode),
  * so regex extraction and the replay encode/decode round-trip are
  * verified across two engines. Filter/dedup/unescape semantics are
  * golden-tested in WorkloadSpec against the reference's counts.
  */
object WorkloadQueries extends QueryModule {

  // The reference's fixture corpus (ported verbatim for golden parity);
  // absolute paths because both Verify and the DuckDB oracle read them.
  private val fixtureDir = "/root/repo/src/test/resources/fixture"
  private val auditLog = s"$fixtureDir/fe.audit.log"
  private val q0 = s"$fixtureDir/q0.sql"
  private val outRoot = "/tmp/graft_workload"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S1+S3: record reassembly + header extraction ------------------
    "w01_audit_scan" -> ((s, _) => {
      AuditLog.records(s, auditLog)
        .withColumn("client", regexp_extract(col("record"), AuditLog.headerRe, 2))
        .withColumn("db", regexp_extract(col("record"), AuditLog.headerRe, 4))
        .withColumn("is_query", regexp_extract(col("record"), AuditLog.headerRe, 7))
        .filter(col("client") =!= "")
        .groupBy("client", "db", "is_query")
        .agg(count(lit(1)).as("n"))
        .orderBy("client", "db", "is_query")
    }),

    // ---- F2–F7: full pipeline, encode side checked by DuckDB decode ----
    "w02_audit_pipeline_encode" -> ((s, _) => {
      val q = AuditLog.queries(s, auditLog, AuditLog.ScanOpts(strict = true))
      AuditLog.encoded(q).write.mode("overwrite").parquet(s"$outRoot/encoded")
      // Spark aggregates the PRE-encode rows; the oracle re-decodes the
      // landed POST-encode lines — a cross-engine round-trip check.
      q.groupBy("db")
        .agg(count(lit(1)).as("n"), sum(col("durationMs")).as("total_ms"))
        .orderBy("db")
    }),

    // ---- F6: replay-file decode ----------------------------------------
    "w03_replay_decode" -> ((s, _) => {
      ReplayCodec.decode(s, q0)
        .groupBy("client")
        .agg(count(lit(1)).as("n"), min(col("ts")).as("ts_min"),
             sum(col("durationMs")).as("total_ms"))
        .orderBy("client")
    })
  )

  val oracles: Map[String, String] = Map(
    "w01_audit_scan" -> s"""
      SELECT regexp_extract(line, '${AuditLog.headerRe}', 2) AS client,
             regexp_extract(line, '${AuditLog.headerRe}', 4) AS db,
             regexp_extract(line, '${AuditLog.headerRe}', 7) AS is_query,
             COUNT(*) AS n
      FROM (SELECT unnest(string_split(content, chr(10))) AS line
            FROM read_text('$auditLog'))
      WHERE regexp_extract(line, '${AuditLog.headerRe}', 2) <> ''
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "w02_audit_pipeline_encode" -> s"""
      SELECT json_extract_string(meta, '$$.db') AS db,
             COUNT(*) AS n,
             CAST(SUM(COALESCE(CAST(json_extract(meta, '$$.durationMs') AS BIGINT), 0)) AS BIGINT) AS total_ms
      FROM (SELECT regexp_extract(line, '^/\\*dodo(\\{.*?\\})\\*/', 1) AS meta
            FROM read_parquet('$outRoot/encoded/*.parquet'))
      GROUP BY 1 ORDER BY 1""",

    "w03_replay_decode" -> s"""
      SELECT json_extract_string(meta, '$$.client') AS client,
             COUNT(*) AS n,
             MIN(json_extract_string(meta, '$$.ts')) AS ts_min,
             CAST(SUM(COALESCE(CAST(json_extract(meta, '$$.durationMs') AS BIGINT), 0)) AS BIGINT) AS total_ms
      FROM (SELECT regexp_extract(line, '^/\\*dodo(\\{.*?\\})\\*/', 1) AS meta
            FROM (SELECT unnest(string_split(content, chr(10))) AS line
                  FROM read_text('$q0'))
            WHERE line LIKE '/*dodo{%')
      GROUP BY 1 ORDER BY 1"""
  )
}
