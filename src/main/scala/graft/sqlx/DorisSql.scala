package graft.sqlx

/** Doris SQL → Spark SQL dialect translation (SURVEY.md §7.2 item 4):
  * the grammar quirks Catalyst does not accept natively are rewritten
  * *before* `spark.sql`, never as a Catalyst rule:
  *
  *   - `QUALIFY <pred>`        → wrap in a subquery computing the
  *                               predicate, filter, drop the helper col
  *                               (Spark has no QUALIFY);
  *   - `LIMIT m, n`            → `LIMIT n OFFSET m`;
  *   - `MINUS`                 → `EXCEPT`;
  *   - `JOIN [broadcast] t` / `[shuffle]` distribute hints
  *                             → Catalyst `/*+ BROADCAST(t) */` /
  *                               `/*+ SHUFFLE_HASH(t) */` in the SELECT.
  *
  * Rewrites operate on top-level tokens only (string literals, comments
  * and parenthesized subqueries are opaque).
  */
object DorisSql {

  def translate(sql: String): String =
    rewriteQualify(rewriteLimitCommaOffset(rewriteMinus(rewriteDistributeHints(sql))))

  /** Doris join distribute hints (DorisParser.g4 joinRelation,
    * distributeType): `[broadcast]`/`[shuffle]` before the right-side
    * relation become Catalyst join-strategy hints on the enclosing
    * SELECT, named by the relation's alias (or its table name). */
  private val distHintRe =
    """(?i)\[\s*(broadcast|shuffle)\s*\]\s*(`?[A-Za-z_][\w.]*`?)(?:\s+(?:as\s+)?(`?[A-Za-z_]\w*`?))?""".r
  private val relKeywords = Set("on", "using", "where", "join", "inner", "left",
    "right", "full", "cross", "group", "order", "limit", "qualify", "having")

  private def rewriteDistributeHints(sql: String): String = {
    val hints = Seq.newBuilder[String]
    val stripped = distHintRe.replaceAllIn(sql, m => {
      val kind = m.group(1).toLowerCase
      val table = m.group(2).stripPrefix("`").stripSuffix("`")
      val alias = Option(m.group(3)).map(_.stripPrefix("`").stripSuffix("`"))
        .filterNot(a => relKeywords.contains(a.toLowerCase))
      val name = alias.getOrElse(table.split('.').last)
      hints += (if (kind == "broadcast") s"BROADCAST($name)" else s"SHUFFLE_HASH($name)")
      scala.util.matching.Regex.quoteReplacement(
        m.matched.replaceFirst("(?i)\\[\\s*(broadcast|shuffle)\\s*\\]\\s*", ""))
    })
    val hs = hints.result()
    if (hs.isEmpty) sql
    else wordTokens(stripped).find(t => t._1 == "select" && t._4 == 0) match {
      case Some((_, _, e, _)) =>
        stripped.substring(0, e) + s" /*+ ${hs.mkString(", ")} */" + stripped.substring(e)
      case None => stripped
    }
  }

  /** Token walk: yields (tokenLower, startIdx, endIdx, depth) for word
    * tokens outside strings/comments. */
  private def wordTokens(sql: String): Seq[(String, Int, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int, Int)]
    var i = 0; var depth = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c; i += 1
        while (i < n && sql.charAt(i) != q) {
          if (sql.charAt(i) == '\\') i += 1
          i += 1
        }
        i += 1
      } else if (c == '`') { i += 1; while (i < n && sql.charAt(i) != '`') i += 1; i += 1 }
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val j = sql.indexOf('\n', i); i = if (j < 0) n else j
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val j = sql.indexOf("*/", i + 2); i = if (j < 0) n else j + 2
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
        out += ((sql.substring(s, i).toLowerCase, s, i, depth))
      } else i += 1
    }
    out.result()
  }

  private def rewriteMinus(sql: String): String = {
    val toks = wordTokens(sql).filter(_._1 == "minus")
    toks.foldRight(sql) { case ((_, s, e, _), acc) =>
      acc.substring(0, s) + "EXCEPT" + acc.substring(e)
    }
  }

  /** `LIMIT m, n` → `LIMIT n OFFSET m` at any depth (the comma form is
    * unambiguous: LIMIT <int> , <int>). */
  private val limitCommaRe =
    """(?i)\bLIMIT\s+(\d+)\s*,\s*(\d+)""".r
  private def rewriteLimitCommaOffset(sql: String): String =
    limitCommaRe.replaceAllIn(sql, m => s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}")

  /** Top-level QUALIFY: inject the predicate as a helper column in the
    * select list (it may reference window functions, so it must be
    * computed inside), wrap, filter, and drop the helper:
    *
    *   SELECT <list> FROM <rel> QUALIFY <pred> <tail>
    *   → SELECT * EXCEPT (__qualify)
    *     FROM (SELECT <list>, (<pred>) AS __qualify FROM <rel>)
    *     WHERE __qualify <tail>
    */
  private def rewriteQualify(sql: String): String = {
    val toks = wordTokens(sql)
    toks.find(t => t._1 == "qualify" && t._4 == 0) match {
      case None => sql
      case Some((_, qs, qe, _)) =>
        val fromTok = toks.find(t => t._1 == "from" && t._4 == 0)
          .getOrElse(return sql)
        // the predicate runs until a top-level ORDER/LIMIT or statement end
        val stop = toks.find(t => t._2 > qe && t._4 == 0 &&
            (t._1 == "order" || t._1 == "limit"))
          .map(_._2).getOrElse(sql.length)
        val selectList = sql.substring(0, fromTok._2)
        val rel = sql.substring(fromTok._2, qs)
        val pred = sql.substring(qe, stop).trim
        val tail = sql.substring(stop)
        s"SELECT * EXCEPT (__qualify) FROM ($selectList, ($pred) AS __qualify $rel) WHERE __qualify $tail"
    }
  }
}
