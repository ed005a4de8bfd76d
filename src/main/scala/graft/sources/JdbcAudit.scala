package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4: audit-log TABLE scan over JDBC (reference: src/db.go:464-634).
  *
  * The reference hand-rolls keyset pagination
  * (`time > t OR (time = t AND query_id > id)`, 100 rows/SELECT) plus a
  * per-thread range split and an ordered-consume condvar. On Spark all
  * three collapse into a partitioned JDBC read: each predicate below
  * becomes one partition/task, tasks stream independently, and
  * deterministic output order is a plan property (`orderBy`) instead of
  * a lock protocol. Column filters (F1) are plain `.filter`s — Catalyst
  * pushes them into each partition's WHERE.
  */
object JdbcAudit {

  /** F1: pushdown WHERE fragments from scan options (reference:
    * src/auditlog.go:57-80). */
  def pushdownPredicates(
      dbs: Seq[String] = Nil, states: Seq[String] = Nil,
      minDurationMs: Long = 0, onlyQueries: Boolean = true,
      fromMs: Long = 0, toMs: Long = 0,
      timeCol: String = "time"): Seq[String] = {
    def inList(c: String, vs: Seq[String]) =
      if (vs.isEmpty) None else Some(s"$c IN (${vs.map(v => s"'$v'").mkString(",")})")
    Seq(
      Some("client_ip != ''"),
      inList("db", dbs),
      inList("state", states),
      if (minDurationMs > 0) Some(s"query_time >= $minDurationMs") else None,
      if (onlyQueries) Some("is_query = 1") else None,
      if (fromMs > 0) Some(s"$timeCol >= $fromMs") else None,
      if (toMs > 0) Some(s"$timeCol <= $toMs") else None
    ).flatten
  }

  /** Disjoint time-range partition predicates — the scale replacement
    * for keyset pagination: `partitions` independent scans, no OFFSET
    * anywhere, each row read exactly once. */
  def rangePredicates(fromMs: Long, toMs: Long, partitions: Int,
                      timeCol: String = "time"): Seq[String] = {
    require(partitions > 0 && toMs > fromMs, "need a positive range and partitions")
    val step = math.max(1L, (toMs - fromMs + partitions - 1) / partitions)
    (0 until partitions).map { i =>
      val lo = fromMs + i * step
      val hi = math.min(fromMs + (i + 1) * step, toMs + 1)
      if (i == partitions - 1) s"$timeCol >= $lo AND $timeCol <= $toMs"
      else s"$timeCol >= $lo AND $timeCol < $hi"
    }
  }

  /** Partitioned JDBC read: one Spark task per range predicate. */
  def read(spark: SparkSession, url: String, table: String,
           rangeParts: Seq[String], pushdown: Seq[String],
           props: Properties = new Properties()): DataFrame = {
    val predicates =
      if (pushdown.isEmpty) rangeParts
      else rangeParts.map(r => (r +: pushdown).map(p => s"($p)").mkString(" AND "))
    spark.read.jdbc(url, table, predicates.toArray, props)
  }
}
