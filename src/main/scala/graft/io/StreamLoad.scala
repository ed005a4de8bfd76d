package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import java.util.Base64
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Live stream-load sink (S11; reference: src/importdata.go:21-88 shells
  * out to curl, cmd/import.go:58-90 fans files out over a bounded
  * parallel group). Spark-first re-expression, no subprocess:
  *
  *   - the wire protocol is an HTTP PUT of CSV bytes to
  *     `/api/{db}/{table}/_stream_load` with `format:csv`,
  *     `column_separator:☆`, `skip_lines`, optional `columns:` mapping
  *     header (BITMAP/HLL transforms), and basic auth;
  *   - Doris FEs answer with a 307 redirect to a BE — curl's
  *     `--location-trusted` re-sends credentials to the redirect target,
  *     so the client here follows redirects MANUALLY and re-attaches
  *     auth (the JDK client would drop it cross-host);
  *   - up to `maxRetries` attempts per file, success means HTTP 200 AND
  *     `Status: Success` in the JSON body (transport success with a
  *     failure body is still a failure — same check as the reference);
  *   - `loadDir` drives the per-file path over a `writeCsv` output dir;
  *     `loadDataset` is the cluster-scale path: each PARTITION of a
  *     DataFrame streams itself as one load from its executor — no
  *     driver disk round-trip, parallelism = partition count.
  */
object StreamLoad {

  final case class Config(
      host: String,
      httpPort: Int,
      user: String = "root",
      password: String = "",
      maxRetries: Int = 3,
      dryRun: Boolean = false) extends Serializable

  final case class LoadError(msg: String) extends RuntimeException(msg)

  /** Result of one accepted load (fields from the engine's JSON reply). */
  final case class LoadResult(rows: Long, bytes: Long)

  val ColumnSeparator = "☆"

  /** The separator as a `\xNN` hex escape: HTTP header values are
    * ASCII-only (the JDK client enforces what curl lets slide), and the
    * engine's stream-load API documents the hex form for exactly this —
    * `\xe2\x98\x86` names the same UTF-8 bytes the raw `☆` would. */
  val ColumnSeparatorHeader: String =
    ColumnSeparator.getBytes(StandardCharsets.UTF_8)
      .map(b => f"\\x${b & 0xff}%02x").mkString

  val FirstLinePrefix = "columns: "

  /** Stream one CSV file (reference StreamLoad semantics: an optional
    * `columns: …` first line becomes the mapping header + skip_lines=1;
    * the file bytes go up whole). */
  def loadFile(cfg: Config, db: String, table: String, file: Path,
               fileProgress: String = ""): LoadResult = {
    val firstLine = {
      val in = Files.newBufferedReader(file, StandardCharsets.UTF_8)
      try Option(in.readLine()).getOrElse("")
      finally in.close()
    }
    require(firstLine.nonEmpty, s"data file '$file' is unreadable or empty")
    val (columnsHeader, skipLines) =
      if (firstLine.startsWith(FirstLinePrefix))
        (Some(firstLine.substring(FirstLinePrefix.length)), 1)
      else (None, 0)
    System.err.println(s"[stream-load] $db.$table ($fileProgress) <- $file")
    if (cfg.dryRun) return LoadResult(0, Files.size(file))
    put(cfg, db, table, columnsHeader, skipLines, Files.readAllBytes(file))
  }

  /** Load every csv part file under `dir` (a writeCsv output), in
    * deterministic name order. */
  def loadDir(cfg: Config, db: String, table: String, dir: String): Seq[LoadResult] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".csv"))
      .toSeq.sortBy(_.getFileName.toString)
    require(files.nonEmpty, s"no csv part files under $dir")
    files.zipWithIndex.map { case (f, i) =>
      loadFile(cfg, db, table, f, s"${i + 1}/${files.size}")
    }
  }

  /** Cluster-scale path: each partition formats its rows to the CSV wire
    * shape and streams itself as ONE load request from its executor.
    * `mapping` is the BITMAP/HLL `columns` transform (streamLoadMapping,
    * without the file-prefix framing). The driver never sees the data.
    *
    * Idempotency scope: the default `loadId` (nanoTime at job submit)
    * makes labels stable across TASK retries/speculation within one job,
    * but a DRIVER-level re-invocation of the same logical load (a caller
    * retrying `loadDataset` after a partial failure) mints fresh labels
    * and can commit duplicate copies of partitions that already landed.
    * For end-to-end exactly-once, pass a stable `loadId` derived from the
    * dataset/batch identity (e.g. `"orders_batch_20260815"`), so every
    * re-invocation re-sends the SAME labels and the server's label dedup
    * (see parseResult's Label-Already-Exists handling) absorbs replays. */
  def loadDataset(df: DataFrame, cfg: Config, db: String, table: String,
                  mapping: Option[String] = None,
                  loadId: Option[String] = None): Unit = {
    val sep = ColumnSeparator
    // idempotency label: stream load dedups ONLY by label, and Spark
    // re-runs tasks (failure retries, speculation) — an unlabeled PUT
    // that succeeded on a dying executor would commit a second copy.
    // The id is fixed at JOB SUBMIT (captured in the closure), so every
    // attempt of partition p sends the same label and the server keeps
    // exactly one.
    val runId = loadId.getOrElse(
      java.lang.Long.toHexString(System.nanoTime()))
    val wire = graft.gen.TableGen.csvWireFrame(df)
    wire.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val sb = new java.lang.StringBuilder(1 << 20)
        rows.foreach { r =>
          var i = 0
          val n = r.length
          while (i < n) {
            if (i > 0) sb.append(sep)
            val v = r.get(i)
            if (v == null) sb.append("\\N")
            else {
              val t = v.toString
              // no quoting on this wire: a value containing the
              // separator or a newline would silently shift columns /
              // split rows — reject loudly (writeCsv's Spark-CSV path
              // quotes; this hand-rolled frame cannot)
              if (t.contains(sep) || t.indexOf('\n') >= 0)
                throw LoadError(s"stream-load value in column $i contains " +
                  "the column separator or a newline and would corrupt " +
                  "row framing; route this dataset through writeCsv + " +
                  "loadDir (quoted CSV) instead")
              sb.append(t)
            }
            i += 1
          }
          sb.append('\n')
        }
        put(cfg, db, table, mapping, 0,
          sb.toString.getBytes(StandardCharsets.UTF_8),
          label = Some(s"graft_${table}_${runId}_p$pid"))
        ()
      }
    }
  }

  // ---- the wire ------------------------------------------------------

  private def put(cfg: Config, db: String, table: String,
                  columnsHeader: Option[String], skipLines: Int,
                  body: Array[Byte],
                  label: Option[String] = None): LoadResult = {
    val url = s"http://${cfg.host}:${cfg.httpPort}/api/$db/$table/_stream_load"
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt < math.max(cfg.maxRetries, 1)) {
      attempt += 1
      try return putOnce(cfg, url, columnsHeader, skipLines, body, label)
      catch { case scala.util.control.NonFatal(e) => lastErr = e }
    }
    throw LoadError(s"stream load failed for '$db.$table' after " +
      s"${cfg.maxRetries} attempt(s): ${lastErr.getMessage}")
  }

  private def putOnce(cfg: Config, url: String, columnsHeader: Option[String],
                      skipLines: Int, body: Array[Byte],
                      label: Option[String]): LoadResult = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NEVER) // manual: location-trusted
      .connectTimeout(Duration.ofSeconds(30))
      .build()
    val auth = "Basic " + Base64.getEncoder.encodeToString(
      s"${cfg.user}:${cfg.password}".getBytes(StandardCharsets.UTF_8))
    var target = url
    var redirects = 0
    while (true) {
      val b = HttpRequest.newBuilder(URI.create(target))
        .PUT(HttpRequest.BodyPublishers.ofByteArray(body))
        // the reference's 'Expect:100-continue' — the JDK client manages
        // the restricted header itself via expectContinue
        .expectContinue(true)
        .header("Authorization", auth)
        .header("format", "csv")
        .header("column_separator", ColumnSeparatorHeader)
        .header("skip_lines", skipLines.toString)
      columnsHeader.foreach(m => b.header("columns", m))
      label.foreach(l => b.header("label", l))
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 307 | 302 | 301 =>
          redirects += 1
          require(redirects <= 5, s"too many redirects from $url")
          target = resp.headers().firstValue("Location")
            .orElseThrow(() => LoadError("redirect without Location"))
        case 200 =>
          return parseResult(resp.body())
        case other =>
          throw LoadError(s"HTTP $other: ${resp.body().take(200)}")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `Status` must be `Success`; error text comes from Message/msg/data
    * with ErrorURL as detail (same fallback chain as the reference).
    *
    * `Label Already Exists` is the idempotency protocol WORKING, not a
    * rejection: a retried/speculative task (or a PUT whose 200 got lost
    * on the wire) re-sends the same label and the server reports the
    * earlier job's fate in `ExistingJobStatus`. FINISHED/VISIBLE means
    * the data already landed exactly once — success (rows/bytes are the
    * dedup'd zero this attempt contributed). Any other existing status
    * (aborted/unknown/in-flight) stays a failure so `put`'s retry loop
    * re-drives it. */
  private[io] def parseResult(json: String): LoadResult = {
    val m =
      try new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Any]](json).asScala
      catch { case scala.util.control.NonFatal(_) =>
        throw LoadError(s"unparseable stream-load reply: ${json.take(200)}")
      }
    val status = m.get("Status").map(_.toString).getOrElse("")
    if (status == "Label Already Exists") {
      val existing = m.get("ExistingJobStatus").map(_.toString.toUpperCase)
        .getOrElse("")
      if (existing == "FINISHED" || existing == "VISIBLE")
        return LoadResult(0, 0)
      throw LoadError(s"stream load label already exists with " +
        s"ExistingJobStatus '${if (existing.isEmpty) "unknown" else existing}'" +
        " (prior attempt did not commit)")
    }
    if (status != "Success") {
      val msg = m.get("Message").orElse(m.get("msg")).orElse(m.get("data"))
        .map(_.toString).getOrElse("unknown")
      val detail = m.get("ErrorURL").map(u => s", details: $u").getOrElse("")
      throw LoadError(s"stream load rejected: $msg$detail")
    }
    def num(k: String): Long =
      m.get(k).collect { case n: Number => n.longValue() }.getOrElse(0L)
    LoadResult(num("NumberLoadedRows"), num("LoadBytes"))
  }
}
