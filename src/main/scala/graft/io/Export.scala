package graft.io

import org.apache.spark.sql.DataFrame

/** S12: bulk export (SURVEY.md §2.1). The reference emits
  * `EXPORT TABLE db.t TO 'url'` and polls Doris; Spark writes directly,
  * so the operator reduces to URL templating + a configured write —
  * every executor streams its partition straight to the target store, no
  * driver polling loop exists to port (reference: src/export.go:22-80,
  * cmd/export.go:86).
  */
object Export {

  /** `{db}`/`{table}` URL templating (reference: cmd/export.go:86). */
  def resolveUrl(template: String, db: String, table: String): String =
    template.replace("{db}", db).replace("{table}", table)

  case class Options(
      format: String = "csv",            // csv | parquet | json
      sep: String = "☆",                 // reference CSV wire shape
      nullValue: String = "\\N",
      maxRecordsPerFile: Long = 20000L,
      extra: Map[String, String] = Map.empty)

  /** Export a frame to `urlTemplate` with `{db}`/`{table}` resolved. */
  def export(df: DataFrame, urlTemplate: String, db: String, table: String,
             opts: Options = Options()): String = {
    val url = resolveUrl(urlTemplate, db, table)
    val w0 = df.write.mode("overwrite")
      .option("maxRecordsPerFile", opts.maxRecordsPerFile)
    val w = opts.format match {
      case "csv" => w0.option("sep", opts.sep).option("nullValue", opts.nullValue)
        .option("emptyValue", "")
      case _ => w0
    }
    opts.extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .format(opts.format).save(url)
    url
  }
}
