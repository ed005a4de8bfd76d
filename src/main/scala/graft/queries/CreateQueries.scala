package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryModule
import graft.Tables.t
import graft.create.Create
import graft.dump.SchemaDump

/** The `create` verb as a driver-checkable query: Doris-dialect schema
  * files (a table + a two-deep view chain whose file order forces the
  * retry queue) are applied to the Spark catalog, the landed `nation`
  * parquet is inserted into the created table, and the final SELECT goes
  * through BOTH created views — so DDL translation, replication clamping,
  * view dependency retry, and data round-trip are all on the verified
  * path. The DuckDB oracle computes the same aggregate straight from the
  * parquet file (it never sees the catalog), so any create-side schema
  * or data corruption breaks the hash.
  */
object CreateQueries extends QueryModule {

  private val db = "graft_c01"

  // Doris-dialect DDLs: OLAP tail + replication to exercise the clamp.
  private val tableDdl =
    s"""CREATE TABLE `nation_src` (
       |  `n_nationkey` INT NOT NULL COMMENT 'key',
       |  `n_name` VARCHAR(25) NOT NULL,
       |  `n_regionkey` INT NOT NULL
       |) ENGINE=OLAP
       |DUPLICATE KEY(`n_nationkey`)
       |DISTRIBUTED BY HASH(`n_nationkey`) BUCKETS 3
       |PROPERTIES ("replication_num" = "3", "storage_format" = "V2")""".stripMargin

  // `a_top` sorts before `m_agg`, so the queue sees the dependent view
  // first and must retry it — the reference's cmd/create.go:94-123 path.
  private val aggViewDdl =
    "CREATE VIEW m_agg AS SELECT n_regionkey, count(*) AS cnt " +
      "FROM nation_src GROUP BY n_regionkey"
  private val topViewDdl =
    "CREATE VIEW a_top AS SELECT n_regionkey, cnt FROM m_agg WHERE cnt > 0"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_create_roundtrip" -> ((s, dir) => {
      s.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE") // re-runnable
      val ddlDir = Files.createTempDirectory("graft_c01_ddl").toString
      SchemaDump.writeSchemas(ddlDir, db, Seq(
        ("nation_src", "table", tableDdl),
        ("a_top", "view", topViewDdl),
        ("m_agg", "view", aggViewDdl)))
      val outcomes = Create.createFromDir(s, ddlDir, Create.Options(beCount = 1))
      require(outcomes.count(_.action == "created") == 3,
        s"expected 3 created schemas, got $outcomes")
      require(outcomes.exists(o => o.name == "a_top" && o.rounds > 1),
        "dependent view should have needed a retry round")
      t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("append").insertInto(s"`$db`.`nation_src`")
      s.sql(s"SELECT n_regionkey, cnt FROM `$db`.`a_top` ORDER BY n_regionkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "c01_create_roundtrip" ->
      """SELECT n_regionkey, count(*) AS cnt FROM nation
        |GROUP BY n_regionkey HAVING count(*) > 0 ORDER BY n_regionkey""".stripMargin
  )
}
