package graft.dump

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.anon.Anonymizer

/** Schema dump/ingest (SURVEY.md §2.1 S5/S9, §2.2 F8/F9): DDL text from
  * the engine catalog, one `<db>.<table>.<type>.sql` file per schema,
  * filename round-trip, and replication-property normalization for
  * re-creation on a differently-sized cluster.
  */
object SchemaDump {

  /** S5: CREATE statement of a catalog table/view via the engine
    * (reference: src/db.go:124-208 does SHOW CREATE TABLE over the wire;
    * here the engine IS the catalog). */
  def showCreate(spark: SparkSession, table: String): String =
    spark.sql(s"SHOW CREATE TABLE $table").head().getString(0)

  /** Tables of a database from the catalog (reference lists
    * information_schema.TABLES). */
  def listTables(spark: SparkSession, db: String): Seq[(String, String)] =
    spark.catalog.listTables(db).collect().toSeq
      // catalog.listTables(db) also returns session/global TEMP views —
      // they don't live in `db` and have no persistent DDL to dump (and a
      // concurrent session's temp view must never leak into a schema dump)
      .filterNot(_.isTemporary)
      .map(t => t.name -> (if (t.tableType == "VIEW") "view" else "table"))

  /** S9: one `<db>.<table>.<type>.sql` file per schema; optional
    * anonymization rewrites identifiers inside the DDL AND in the file
    * name with the same context (N4). */
  def writeSchemas(dir: String, db: String, schemas: Seq[(String, String, String)],
                   anonymizer: Option[Anonymizer.Context] = None): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    schemas.map { case (table, schemaType, ddl) =>
      val (fileName, text) = anonymizer match {
        case Some(ctx) =>
          (Anonymizer.anonymizeSchemaFileName(ctx, s"$db.$table.$schemaType.sql"),
           Anonymizer.anonymizeSql(ctx, ddl, hideComments = true))
        case None => (s"$db.$table.$schemaType.sql", ddl)
      }
      Files.writeString(Paths.get(dir, fileName), text + "\n")
      fileName
    }
  }

  /** F8: db/table/type back out of a schema file name. */
  private val FileNameRe = """^(.+?)\.(.+?)\.(table|view|materialized_view)\.sql$""".r
  def parseFileName(name: String): Option[(String, String, String)] = name match {
    case FileNameRe(db, table, tpe) => Some((db, table, tpe))
    case _ => None
  }

  /** Read a schema dir back: (db, table, type, ddl) per parseable file. */
  def readSchemas(dir: String): Seq[(String, String, String, String)] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq.sortBy(_.toString).flatMap { p =>
      parseFileName(p.getFileName.toString).map { case (db, t, tpe) =>
        (db, t, tpe, Files.readString(p))
      }
    }

  /** F9: clamp replication properties to the target cluster's backend
    * count (reference: src/create.go:126-155 rewrites via parse-listener;
    * the properties are opaque `"k" = "v"` pairs, so a targeted text
    * rewrite preserves everything else byte-for-byte). */
  def normalizeReplication(ddl: String, beCount: Int): String = {
    val numRe = """("replication_num"\s*=\s*")(\d+)(")""".r
    val allocRe = """("replication_allocation"\s*=\s*"tag\.location\.[^:"]+:\s*)(\d+)(")""".r
    val step1 = numRe.replaceAllIn(ddl, m =>
      m.group(1) + math.min(m.group(2).toInt, beCount) + m.group(3))
    allocRe.replaceAllIn(step1, m =>
      m.group(1) + math.min(m.group(2).toInt, beCount) + m.group(3))
  }
}
