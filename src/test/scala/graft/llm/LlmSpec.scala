package graft.llm

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files
import graft.SparkSpec
import graft.anon.Anonymizer

/** LLM-assisted gendata plumbing: prompt assembly, anonymize-before-send,
  * completion parsing, de-anonymization, validation, and the confirm
  * gate — all offline behind a fake transport. */
class LlmSpec extends SparkSpec {

  private val ddl =
    """CREATE TABLE `customer_orders` (
      |  `order_id` BIGINT NOT NULL,
      |  `customer_email` VARCHAR(64) NULL,
      |  `amount` DECIMAL(10,2) NOT NULL
      |) ENGINE=OLAP
      |DUPLICATE KEY(`order_id`)
      |DISTRIBUTED BY HASH(`order_id`) BUCKETS 4
      |PROPERTIES ("replication_num" = "1")""".stripMargin

  private val query =
    "SELECT customer_email, sum(amount) FROM customer_orders " +
      "WHERE amount > 100 GROUP BY customer_email"

  /** Transport that records the request and returns a canned reply. */
  private class FakeTransport(reply: String) extends LlmTransport {
    var seen: ChatRequest = _
    def complete(req: ChatRequest): String = { seen = req; reply }
  }

  test("prompt assembly: sections, system guide, fence prefix") {
    val p = LlmGendata.prepare("test-model", Seq(ddl), Nil, Seq(query),
      extraPrompt = "make amounts large")
    val u = p.request.user
    assert(u.contains("<tables>") && u.contains("<column-stats>") &&
      u.contains("<queries>") && u.contains("<additional-user-prompt>"))
    assert(u.contains("customer_orders") && u.contains("make amounts large"))
    assert(p.request.assistantPrefix == "```yaml\n")
    assert(p.request.system.contains("tables:"))
    assert(p.aliasToOrig.isEmpty) // no anonymization requested
  }

  test("anonymize-before-send: no original identifier reaches the prompt") {
    val ctx = new Anonymizer.Context(method = "minihash")
    val p = LlmGendata.prepare("m", Seq(ddl), Nil, Seq(query), "", Some(ctx))
    val u = p.request.user
    for (id <- Seq("customer_orders", "customer_email", "order_id", "amount"))
      assert(!u.toLowerCase.contains(id), s"identifier '$id' leaked into prompt")
    // the reverse map covers the table and every column
    assert(p.aliasToOrig.values.toSet ==
      Set("customer_orders", "order_id", "customer_email", "amount"))
  }

  test("completion parsing strips fences; validation rejects unknown tables") {
    val fenced = "```yaml\ntables:\n  - name: t1\n    row_count: 5\n```"
    val conf = LlmGendata.parseCompletion(fenced)
    assert(!conf.contains("```") && conf.contains("tables:"))
    assert(LlmGendata.validate(conf, Set("t1")) == Right(Seq("t1")))
    assert(LlmGendata.validate(conf, Set("other")).isLeft)
    assert(LlmGendata.validate("{{{not yaml", Set("t1")).isLeft)
  }

  test("generate round-trip: anonymized prompt, de-anonymized genconf") {
    val ctx = new Anonymizer.Context(method = "minihash")
    // learn the aliases the context WILL hand out, to write the fake reply
    // the way a model that saw the anonymized prompt would
    val probe = new Anonymizer.Context(method = "minihash")
    Anonymizer.anonymizeSql(probe, ddl, hideComments = true) // same encounter order
    val tAlias = probe.anonymize("customer_orders")
    val cAlias = probe.anonymize("amount")
    val reply =
      s"""```yaml
         |tables:
         |  - name: $tAlias
         |    row_count: 7
         |    columns:
         |      - name: $cAlias
         |        min: 100
         |        max: 5000
         |```""".stripMargin
    val ft = new FakeTransport(reply)
    val conf = LlmGendata.generate(ft, "m", Seq(ddl), Nil, Seq(query),
      anonymize = Some(ctx))
    // prompt was anonymized…
    assert(!ft.seen.user.contains("customer_orders"))
    // …but the returned genconf names the REAL table and column
    assert(conf.contains("customer_orders") && conf.contains("amount"))
    assert(!conf.contains(s"name: $tAlias\n"))
    // and it actually drives generation
    val dfs = graft.gen.GenPlanner.generateDatasets(spark,
      Seq(graft.ddl.DorisDdl.parseCreateTable(ddl)), conf, seed = 1, defaultRows = 3)
    val rows = dfs.head("customer_orders")
    assert(rows.count() == 7)
    val amounts = rows.select("amount").collect().map(_.getDecimal(0))
    assert(amounts.forall(a => a.doubleValue >= 100 && a.doubleValue <= 5000))
  }

  test("hallucinated table name fails validation loudly") {
    val ft = new FakeTransport("```yaml\ntables:\n  - name: made_up\n```")
    val e = intercept[IllegalArgumentException] {
      LlmGendata.generate(ft, "m", Seq(ddl), Nil, Nil)
    }
    assert(e.getMessage.contains("made_up"))
  }

  test("confirm gate: y proceeds, anything else aborts") {
    val out = new PrintStream(new ByteArrayOutputStream())
    def ask(answer: String) = LlmGendata.confirm("use it?",
      new BufferedReader(new StringReader(answer)), out)
    assert(ask("y") && ask("YES"))
    assert(!ask("n") && !ask("") && !ask("whatever"))
  }

  test("CLI flow: --llm with canned response generates data after --yes") {
    val dir = Files.createTempDirectory("llm_cli").toString
    val ddlPath = s"$dir/t.sql"
    Files.writeString(java.nio.file.Paths.get(ddlPath), ddl)
    val reply =
      """```yaml
        |tables:
        |  - name: customer_orders
        |    row_count: 4
        |```""".stripMargin
    val replyPath = s"$dir/reply.txt"
    Files.writeString(java.nio.file.Paths.get(replyPath), reply)
    graft.cli.Cli.run(spark, "gendata", Map(
      "ddl" -> ddlPath, "out" -> s"$dir/out", "llm" -> "test-model",
      "llm-response" -> replyPath, "query" -> query, "yes" -> "true",
      "format" -> "parquet"))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/out/gendata.yaml")))
    val generated = spark.read.parquet(s"$dir/out/customer_orders/conf_0")
    assert(generated.count() == 4)
  }
}
