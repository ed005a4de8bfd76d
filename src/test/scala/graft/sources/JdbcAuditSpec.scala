package graft.sources

import java.sql.DriverManager
import graft.SparkSpec

/** S4: partitioned JDBC audit-table scan against embedded Derby — a real
  * wire read, no mocks: range predicates become Spark partitions and
  * pushdown predicates reach each partition's WHERE. */
class JdbcAuditSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:auditdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE audit_tbl (
      time BIGINT, client_ip VARCHAR(32), db VARCHAR(32), state VARCHAR(8),
      query_time BIGINT, query_id VARCHAR(32), is_query INT, stmt VARCHAR(256))""")
    val ins = conn.prepareStatement("INSERT INTO audit_tbl VALUES (?,?,?,?,?,?,?,?)")
    (0 until 500).foreach { i =>
      ins.setLong(1, 1000L + i)
      ins.setString(2, if (i % 7 == 0) "" else s"10.0.0.${i % 5}:9030")
      ins.setString(3, if (i % 2 == 0) "shop" else "other")
      ins.setString(4, "EOF")
      ins.setLong(5, i % 100)
      ins.setString(6, s"q$i")
      ins.setInt(7, if (i % 11 == 0) 0 else 1)
      ins.setString(8, s"SELECT $i")
      ins.addBatch()
    }
    ins.executeBatch()
    conn.close()
  }

  test("range predicates partition the scan; pushdown filters apply") {
    val ranges = JdbcAudit.rangePredicates(1000L, 1499L, partitions = 4)
    assert(ranges.length == 4)
    val push = JdbcAudit.pushdownPredicates(dbs = Seq("shop"), minDurationMs = 10)
    val df = JdbcAudit.read(spark, url, "audit_tbl", ranges, push)
    assert(df.rdd.getNumPartitions == 4)
    val rows = df.collect()
    // every row passed every filter
    assert(rows.forall(r => r.getAs[String]("DB") == "shop"))
    assert(rows.forall(r => r.getAs[Long]("QUERY_TIME") >= 10))
    assert(rows.forall(r => r.getAs[String]("CLIENT_IP").nonEmpty))
    assert(rows.forall(r => r.getAs[Int]("IS_QUERY") == 1))
    // and no row was read twice (disjoint ranges)
    val ids = rows.map(_.getAs[String]("QUERY_ID"))
    assert(ids.distinct.length == ids.length)
    assert(rows.length > 100)
  }

  test("partition ranges cover the span exactly once") {
    val all = JdbcAudit.read(spark, url, "audit_tbl",
      JdbcAudit.rangePredicates(1000L, 1499L, 3), Nil)
    assert(all.count() == 500)
  }
}
