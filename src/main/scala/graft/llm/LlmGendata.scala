package graft.llm

import java.io.BufferedReader
import java.nio.file.{Files, Paths}
import graft.anon.Anonymizer
import graft.ddl.{DorisDdl, TableDef}
import graft.genrule.{GenRules, TableStats}
import graft.stats.Stats

/** LLM-assisted gendata configuration (reference: src/llm.go:23-116 and
  * cmd/gendata.go:110-147): assemble a prompt from schemas + column stats
  * + workload queries, OPTIONALLY anonymized first (so no customer
  * identifier ever reaches the model), send it through a pluggable
  * transport, validate the YAML that comes back, and put a human confirm
  * gate between the model's output and any data generation.
  *
  * Everything except the transport is offline logic; the environment has
  * no network, so the shipped transports are a canned-response file (CLI
  * `--llm-response`) and test fakes. A real HTTP transport is one class
  * implementing `LlmTransport` — the prompt/anonymize/validate/confirm
  * pipeline doesn't change.
  */
final case class ChatRequest(
    model: String,
    system: String,
    assistantPrefix: String,
    user: String,
    temperature: Double = 0.1,
    topP: Double = 0.9,
    stop: String = "\n```")

trait LlmTransport {
  /** One chat completion: returns the raw model text (the reference
    * streams; the transport contract only cares about the final text). */
  def complete(req: ChatRequest): String
}

/** Canned-completion transport — the completion is read from a file. */
final class FileTransport(path: String) extends LlmTransport {
  def complete(req: ChatRequest): String = Files.readString(Paths.get(path))
}

object LlmGendata {

  /** The model is prompted to open with this fence (reference
    * LLMOutputPrefix, src/llm.go:19-20) so output parsing is anchored. */
  val OutputPrefix = "```yaml\n"

  /** System prompt: a concise guide to THIS engine's genconf dialect
    * (GenRules/GenPlanner), not a copy of anyone else's. Kept in code so
    * it versions with the rule model it documents. */
  val SystemPrompt: String =
    """You are an expert data engineer. Generate a YAML configuration for
      |the `gendata` verb of the graft engine from the user's table DDLs,
      |optional column stats, and optional workload queries.
      |
      |Requirements:
      |1. Generated data must satisfy the tables' DDL constraints and make
      |   the user's queries return rows.
      |2. When column stats conflict with query predicates, prioritize the
      |   query predicates.
      |3. Only configure columns that matter (join keys, filter columns);
      |   defaults cover the rest.
      |4. Output ONLY valid YAML, inside a ```yaml fence, nothing else.
      |
      |Genconf dialect (one YAML document per dataset, `---`-separated):
      |  null_frequency: <0..1>          # global default
      |  type:                            # per-type default overrides
      |    INT: {min: 0, max: 100}
      |  tables:
      |    - name: <table>
      |      row_count: <n>
      |      columns:
      |        - name: <col>
      |          null_frequency: <0..1>
      |          min: <v>   # numeric/date range
      |          max: <v>
      |          length: {min: <n>, max: <n>}   # string/array length
      |          gen:       # custom generators (pick at most one)
      |            inc: {start: <n>, step: <n>}
      |            enum: {values: [..], weights: [..]}
      |            format: "<template with {tag} parts>"
      |            expr: "<Spark SQL expression>"
      |            ref: {table: <t>, column: <c>}
      |""".stripMargin

  /** User prompt in the reference's section shape (src/llm.go:41-66). */
  def userPrompt(tables: Seq[String], columnStats: Seq[String],
                 sqls: Seq[String], extraPrompt: String = ""): String = {
    val base =
      s"""
         |<tables>
         |${tables.mkString("\n")}
         |</tables>
         |
         |
         |<column-stats>
         |${columnStats.mkString("\n---\n")}
         |</column-stats>
         |
         |
         |<queries>
         |${sqls.mkString("\n")}
         |</queries>
         |""".stripMargin
    if (extraPrompt.isEmpty) base
    else s"$base\n<additional-user-prompt>\n$extraPrompt\n</additional-user-prompt>\n"
  }

  /** A fully-assembled request plus what's needed to undo anonymization
    * on the way back. `aliasToOrig` covers every table/column identifier
    * of the input DDLs (the only names a genconf can reference). */
  final case class Prepared(request: ChatRequest,
                            aliasToOrig: Map[String, String])

  /** Assemble the chat request. When `anonymize` is set, DDLs, stats and
    * queries are rewritten BEFORE they enter the prompt (reference:
    * cmd/gendata.go:112-119 — anonymize-before-send), and the reverse
    * mapping is captured from the parsed DDL identifiers. */
  def prepare(model: String, ddls: Seq[String], stats: Seq[TableStats],
              sqls: Seq[String], extraPrompt: String = "",
              anonymize: Option[Anonymizer.Context] = None): Prepared = {
    val (outDdls, outStats, outSqls, reverse) = anonymize match {
      case None => (ddls, stats, sqls, Map.empty[String, String])
      case Some(ctx) =>
        val aDdls = ddls.map(d => Anonymizer.anonymizeSql(ctx, d, hideComments = true))
        val aStats = stats.map(t => t.copy(
          name = ctx.anonymize(t.name),
          columns = t.columns.map(c => c.copy(name = ctx.anonymize(c.name)))))
        val aSqls = sqls.map(q => Anonymizer.anonymizeSql(ctx, q))
        // reverse map from the DDL-declared identifiers — parse each DDL
        // for its table + column names and anonymize them the same way
        val ids = ddls.flatMap { d =>
          scala.util.Try(DorisDdl.parseCreateTable(d)).toOption.toSeq
            .flatMap(td => td.name +: td.schema.fields.map(_.name).toSeq)
        }
        val rev = ids.map(id => ctx.anonymize(id) -> id).toMap
        (aDdls, aStats, aSqls, rev)
    }
    val statYamls = outStats.map(t => Stats.toYaml("db", Seq(t)))
    Prepared(
      ChatRequest(model, SystemPrompt, OutputPrefix,
        userPrompt(outDdls, statYamls, outSqls, extraPrompt)),
      reverse)
  }

  /** Strip the ```yaml fences the model was prompted to produce. */
  def parseCompletion(raw: String): String = {
    var s = raw.trim
    if (s.startsWith("```yaml")) s = s.drop("```yaml".length)
    else if (s.startsWith("```")) s = s.drop(3)
    s = s.stripLeading()
    if (s.endsWith("```")) s = s.dropRight(3)
    s.trim + "\n"
  }

  /** Rewrite the `tables[].name` / `columns[].name` / `gen.ref` values of
    * a genconf back to the original identifiers — the model only ever saw
    * aliases, but generation runs against the real DDLs. */
  def deanonymizeGenconf(genconf: String, aliasToOrig: Map[String, String]): String = {
    if (aliasToOrig.isEmpty) return genconf
    def rewrite(v: Any): Any = v match {
      case m: Map[String, Any] @unchecked =>
        m.map {
          case (k @ ("name" | "table" | "column"), s: String) =>
            k -> aliasToOrig.getOrElse(s, s)
          case (k, vv) => k -> rewrite(vv)
        }
      case l: Seq[Any @unchecked] => l.map(rewrite)
      case other => other
    }
    val docs = GenRules.parseYamlDocs(genconf).map(rewrite)
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    val yaml = new org.yaml.snakeyaml.Yaml(opts)
    docs.map(d => yaml.dump(toJava(d))).mkString("---\n")
  }

  private def toJava(v: Any): Any = v match {
    case m: Map[String, Any] @unchecked =>
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, vv) => jm.put(k, toJava(vv)) }
      jm
    case l: Seq[Any @unchecked] =>
      val jl = new java.util.ArrayList[Any]()
      l.foreach(e => jl.add(toJava(e)))
      jl
    case other => other
  }

  /** Validate a genconf: it must parse as YAML and build a rule Env, and
    * every table it configures must be one of `knownTables` (a model
    * hallucinating a table name is the #1 failure mode). Returns the
    * configured table names. */
  def validate(genconf: String, knownTables: Set[String]): Either[String, Seq[String]] =
    try {
      val docs = GenRules.parseYamlDocs(genconf)
      if (docs.isEmpty) Left("empty genconf")
      else {
        val names = docs.flatMap(d => GenRules.buildEnv(d).tables.keys)
        val unknown = names.filterNot(knownTables.contains)
        if (unknown.nonEmpty)
          Left(s"genconf references unknown table(s): ${unknown.mkString(", ")}")
        else Right(names)
      }
    } catch { case scala.util.control.NonFatal(e) =>
      Left(s"genconf invalid: ${e.getMessage}")
    }

  /** The human confirm gate (reference: src.Confirm, cmd/gendata.go:144-147):
    * the model's config must be eyeballed before data generation runs.
    * Accepts y/yes (case-insensitive); anything else aborts. */
  def confirm(message: String, in: BufferedReader,
              out: java.io.PrintStream): Boolean = {
    out.println(s"$message [y/N] ")
    val line = Option(in.readLine()).getOrElse("")
    Seq("y", "yes").contains(line.trim.toLowerCase)
  }

  /** The whole flow: prepare → transport → strip fences → de-anonymize →
    * validate. Throws IllegalArgumentException on an invalid completion
    * so CLI/driver surfaces it loudly. */
  def generate(transport: LlmTransport, model: String, ddls: Seq[String],
               stats: Seq[TableStats], sqls: Seq[String],
               extraPrompt: String = "",
               anonymize: Option[Anonymizer.Context] = None): String = {
    val prepared = prepare(model, ddls, stats, sqls, extraPrompt, anonymize)
    val raw = transport.complete(prepared.request)
    val conf = deanonymizeGenconf(parseCompletion(raw), prepared.aliasToOrig)
    val known = ddls.flatMap(d =>
      scala.util.Try(DorisDdl.parseCreateTable(d)).toOption.map(_.name)).toSet
    validate(conf, known) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_) => conf
    }
  }
}
