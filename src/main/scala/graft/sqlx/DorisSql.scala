package graft.sqlx

/** Doris SQL → Spark SQL dialect translation (SURVEY.md §7.2 item 4):
  * the grammar quirks Catalyst does not accept natively are rewritten
  * *before* `spark.sql`, never as a Catalyst rule:
  *
  *   - `QUALIFY <pred>`        → wrap in a subquery computing the
  *                               predicate, filter, drop the helper col
  *                               (Spark has no QUALIFY) — applied to
  *                               EVERY query block, recursing through
  *                               CTE bodies and derived tables;
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
    rewriteQualify(rewriteDistinctWindow(rewriteLimitCommaOffset(rewriteMinus(
      rewriteDateFormatPatterns(rewriteDateAddInterval(
        rewriteDistributeHints(rewriteGroupConcat(sql))))))))

  /** MySQL/Doris `DATE_ADD(expr, INTERVAL n unit)` (and DATE_SUB /
    * ADDDATE / SUBDATE) → Spark's `expr ± INTERVAL n unit` arithmetic —
    * Spark's parser accepts the two-arg day form of date_add but NOT
    * the INTERVAL form, which is what replayed MySQL statements carry.
    * The plain `date_add(d, n)` call is native and passes through.
    *
    * Known limits (consistent with the sibling regex rewrites, and
    * acceptable for the replay corpus): the match is not string-literal
    * aware at the OUTER level, so a quoted `'date_add(x, INTERVAL 1
    * DAY)'` inside a VARCHAR literal would be rewritten inside the
    * literal; and the first-arg pattern admits ONE level of nested
    * parentheses, so `date_add(f(g(x)), INTERVAL …)` passes through
    * untranslated and then fails loudly in Spark's parser — the right
    * failure mode for an untranslatable statement. */
  private val dateAddIntervalRe =
    """(?i)\b(date_add|date_sub|adddate|subdate)\s*\(\s*((?:[^()']|'[^']*'|\((?:[^()']|'[^']*')*\))*?)\s*,\s*INTERVAL\s+(\d+)\s+(\w+)\s*\)""".r

  def rewriteDateAddInterval(sql: String): String = {
    // fixpoint: nested calls (date_add(date_add(d, INTERVAL …), INTERVAL …))
    // leave the inner call inside the rewritten arg; re-run until stable
    // (each pass eliminates ≥1 call, so depth bounds the iterations)
    var cur = sql
    var prev = ""
    while (cur != prev) {
      prev = cur
      cur = dateAddIntervalRe.replaceAllIn(cur, m => {
        val op = if (m.group(1).toLowerCase.startsWith("date_sub") ||
                     m.group(1).equalsIgnoreCase("subdate")) "-" else "+"
        java.util.regex.Matcher.quoteReplacement(
          s"(${m.group(2)} $op INTERVAL ${m.group(3)} ${m.group(4)})")
      })
    }
    cur
  }

  /** Doris/MySQL `GROUP_CONCAT` → Spark 4 `listagg`:
    *
    *   group_concat([DISTINCT] e)                   → listagg(e, ', ')
    *   group_concat(e, 'sep')        (Doris form)   → listagg(e, 'sep')
    *   group_concat(e SEPARATOR 's') (MySQL form)   → listagg(e, 's')
    *   … ORDER BY o [ASC|DESC] …                    → WITHIN GROUP (ORDER BY …)
    *
    * Doris's default separator is ", " (reference grammar's
    * functionCallExpression accepts both forms). Arguments may contain
    * string literals and one level of parentheses; deeper nesting passes
    * through untranslated (Catalyst then reports the unknown function,
    * which is the right failure mode for an untranslatable statement). */
  private val groupConcatRe =
    """(?i)\bgroup_concat\s*\(\s*(distinct\s+)?((?:[^()']|'[^']*'|\((?:[^()']|'[^']*')*\))*?)\s*\)""".r
  private val orderByInArgsRe = """(?is)\s+order\s+by\s+(.+)$""".r
  private val separatorInArgsRe = """(?is)\s+separator\s+('(?:[^']|'')*')\s*$""".r
  private val trailingSepArgRe = """(?s)^(.*?),\s*('(?:[^']|'')*')\s*$""".r

  private def rewriteGroupConcat(sql: String): String =
    groupConcatRe.replaceAllIn(sql, m => {
      val distinct = Option(m.group(1)).map(_ => "DISTINCT ").getOrElse("")
      var args = m.group(2).trim
      // peel trailing SEPARATOR first (MySQL places it LAST, after any
      // ORDER BY), then ORDER BY, then the Doris comma-separator form
      val (afterSep, sepOpt) = separatorInArgsRe.findFirstMatchIn(args) match {
        case Some(sm) => (args.substring(0, sm.start).trim, Some(sm.group(1)))
        case None => (args, None)
      }
      args = afterSep
      val (core, orderBy) = orderByInArgsRe.findFirstMatchIn(args) match {
        case Some(ob) => (args.substring(0, ob.start).trim, Some(ob.group(1).trim))
        case None => (args, None)
      }
      val (expr0, sep) = sepOpt match {
        case Some(sp) => (core, sp)
        case None => trailingSepArgRe.findFirstMatchIn(core) match {
          case Some(cm) => (cm.group(1).trim, cm.group(2))
          case None => (core, "', '")
        }
      }
      val within = orderBy.map(o => s" WITHIN GROUP (ORDER BY $o)").getOrElse("")
      scala.util.matching.Regex.quoteReplacement(
        s"listagg($distinct$expr0, $sep)$within")
    })

  /** MySQL/Doris `%`-patterns → JDK datetime patterns, for the pattern
    * literal of date_format / str_to_date calls. Non-pattern letters are
    * single-quoted (JDK treats bare letters as fields). */
  private val MysqlToJdk: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M", 'd' -> "dd",
    'e' -> "d", 'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'l' -> "h",
    'i' -> "mm", 's' -> "ss", 'S' -> "ss", 'f' -> "SSSSSS", 'p' -> "a",
    'j' -> "DDD", 'a' -> "EEE", 'W' -> "EEEE", 'b' -> "MMM", 'M' -> "MMMM",
    'T' -> "HH:mm:ss", 'r' -> "hh:mm:ss a")

  def mysqlPatternToJdk(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '%' && i + 1 < p.length) {
        val d = p.charAt(i + 1)
        sb ++= (if (d == '%') "%" else MysqlToJdk.getOrElse(d, d.toString))
        i += 2
      } else {
        if (c.isLetter) { sb += '\''; sb += c; sb += '\'' } // literal letter
        else if (c == '\'') sb ++= "''"
        else sb += c
        i += 1
      }
    }
    sb.toString
  }

  /** Rewrite the second-argument pattern literal of
    * `date_format(x, '%...')` / `str_to_date(x, '%...')`; str_to_date
    * itself becomes to_timestamp (its Spark equivalent). Only patterns
    * containing '%' are touched, so JDK-style patterns pass through. */
  // first arg may carry ONE level of parentheses (e.g. the interval
  // arithmetic rewriteDateAddInterval produces)
  private val dateFnRe =
    """(?i)\b(date_format|str_to_date)\s*\(((?:[^()']|'[^']*'|\((?:[^()']|'[^']*')*\))*?)'([^']*%[^']*)'\s*\)""".r
  private def rewriteDateFormatPatterns(sql: String): String =
    dateFnRe.replaceAllIn(sql, m => {
      val fn = if (m.group(1).equalsIgnoreCase("str_to_date")) "to_timestamp"
               else m.group(1)
      scala.util.matching.Regex.quoteReplacement(
        s"$fn(${m.group(2)}'${mysqlPatternToJdk(m.group(3))}')")
    })

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

  /** Index just past the string literal opening at `i0` (s(i0) is ' or ").
    * Handles BOTH escape conventions a MySQL-dialect literal can carry:
    * backslash escapes and SQL doubled-quote escaping ('' / "") — without
    * the latter, a literal like 'it''s (' would invert string/code
    * regions and silently miscount parentheses in every scanner below.
    * Unterminated literal → s.length. */
  private def skipString(s: String, i0: Int): Int = {
    val q = s.charAt(i0); val n = s.length
    var i = i0 + 1
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == q) {
        if (i + 1 < n && s.charAt(i + 1) == q) i += 2 // doubled-quote escape
        else return i + 1
      } else i += 1
    }
    n
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
        i = skipString(sql, i)
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

  /** DISTINCT window aggregate: `COUNT(DISTINCT e[, e2…]) OVER …` →
    * `SIZE(COLLECT_SET(e) OVER …)`. Spark rejects DISTINCT in a window
    * aggregate outright (UNSUPPORTED_EXPR_FOR_WINDOW), while replayed
    * Doris/DuckDB workloads use it natively — q88 proved the rewrite's
    * semantics against DuckDB's native implementation row-by-row (ties
    * and frames included); this pass makes the translator perform it.
    * collect_set maintains the distinct set under ANY frame Spark
    * accepts for window aggregates and drops NULLs exactly as
    * COUNT(DISTINCT) does; the multi-argument form counts rows where ALL
    * arguments are non-null, preserved by a CASE-guarded struct. The
    * rewrite is applied at any depth and repeats until no
    * `COUNT(DISTINCT…) OVER` remains (each pass eliminates one); a
    * plain `COUNT(DISTINCT…)` aggregate without OVER is native Spark
    * and passes through. */
  private def rewriteDistinctWindow(sql: String): String = {
    val n = sql.length
    def skipWs(i0: Int): Int = {
      var i = i0; while (i < n && sql.charAt(i).isWhitespace) i += 1; i
    }
    // string-literal-aware matching-paren scan; -1 when unbalanced
    def matchParen(open: Int): Int = {
      var i = open + 1; var depth = 1
      while (i < n && depth > 0) {
        val c = sql.charAt(i)
        if (c == '\'' || c == '"') {
          i = skipString(sql, i) - 1 // loop tail advances past the close
        } else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        if (depth > 0) i += 1
      }
      if (depth == 0) i else -1
    }
    def splitTopCommas(s: String): Seq[String] = {
      val parts = Seq.newBuilder[String]
      var depth = 0; var start = 0; var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'' || c == '"') {
          i = skipString(s, i) - 1 // loop tail advances past the close
        } else if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) { parts += s.substring(start, i); start = i + 1 }
        i += 1
      }
      parts += s.substring(start)
      parts.result().map(_.trim)
    }
    val distinctHead = """(?is)^\s*distinct\b(.*)$""".r
    for ((w, _, we, _) <- wordTokens(sql) if w == "count") {
      val openIdx = skipWs(we)
      if (openIdx < n && sql.charAt(openIdx) == '(') {
        val closeIdx = matchParen(openIdx)
        if (closeIdx > 0) sql.substring(openIdx + 1, closeIdx) match {
          case distinctHead(argText) =>
            val overStart = skipWs(closeIdx + 1)
            if (sql.regionMatches(true, overStart, "over", 0, 4) &&
                (overStart + 4 >= n || !sql.charAt(overStart + 4).isLetterOrDigit)) {
              // the OVER target: an inline (window spec) or a named window
              val afterOver = skipWs(overStart + 4)
              val replEnd =
                if (afterOver < n && sql.charAt(afterOver) == '(') {
                  val c2 = matchParen(afterOver)
                  if (c2 > 0) c2 + 1 else -1
                } else {
                  var i = afterOver
                  while (i < n && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
                  if (i > afterOver) i else -1
                }
              if (replEnd > 0) {
                val countStart = we - "count".length
                val args = splitTopCommas(argText)
                val elem =
                  if (args.length == 1) args.head
                  else s"CASE WHEN ${args.map(a => s"($a) IS NOT NULL").mkString(" AND ")} " +
                    s"THEN struct(${args.mkString(", ")}) END"
                val overText = sql.substring(closeIdx + 1, replEnd)
                return rewriteDistinctWindow(
                  sql.substring(0, countStart) +
                    s"SIZE(COLLECT_SET($elem)$overText)" +
                    sql.substring(replEnd))
              }
            }
          case _ => ()
        }
      }
    }
    sql
  }

  /** QUALIFY at ANY query-block depth (the reference grammar,
    * DorisParser.g4:1240-1261 querySpecification, allows it in every
    * block — replayed logs do carry it inside CTE bodies, derived
    * tables, and EVERY branch of a set-operation chain). Every
    * parenthesized region is rewritten bottom-up first; then the
    * outermost level is split at its top-level set operators (UNION /
    * INTERSECT / EXCEPT, honoring a trailing ALL/DISTINCT) and each
    * branch gets the block transform independently:
    *
    *   SELECT <list> FROM <rel> QUALIFY <pred> <tail>
    *   → SELECT * EXCEPT (__qualify)
    *     FROM (SELECT <list>, (<pred>) AS __qualify FROM <rel>)
    *     WHERE __qualify <tail>
    *
    * A WITH prelude stays OUTSIDE the branch rewrites (its CTEs scope
    * over all branches), and a trailing ORDER BY/LIMIT/OFFSET after the
    * last branch stays global (it orders the whole set result, so it
    * must not be folded into the last branch's subquery). Non-query
    * paren groups (function args, IN-lists) contain no top-level
    * QUALIFY token and pass through unchanged. */
  private def rewriteQualify(sql: String): String =
    rewriteQualifySetAware(mapTopParens(sql)(rewriteQualify))

  private val setOpNames = Set("union", "intersect", "except")

  private def rewriteQualifySetAware(sql: String): String = {
    val toks = wordTokens(sql)
    // EXCEPT is a set op only when a query block follows; `SELECT *
    // EXCEPT (cols)` — which this rewrite itself emits — is followed by
    // a parenthesized COLUMN list, never by SELECT/WITH/ALL/DISTINCT.
    def isSetOp(i: Int): Boolean = {
      val t = toks(i)
      t._4 == 0 && setOpNames.contains(t._1) && (t._1 != "except" || {
        val next = toks.drop(i + 1).find(_._2 >= t._3)
        next.exists(nt => nt._1 == "select" || nt._1 == "all" ||
          nt._1 == "distinct" || nt._1 == "with")
      })
    }
    val ops = toks.indices.filter(isSetOp)
    if (ops.isEmpty) return rewriteQualifyBlock(sql)
    // the op span swallows a following top-level ALL / DISTINCT
    def opEnd(i: Int): Int =
      toks.lift(i + 1)
        .filter(nt => nt._4 == 0 && (nt._1 == "all" || nt._1 == "distinct"))
        .map(_._3).getOrElse(toks(i)._3)
    val firstSelect = toks.find(t => t._4 == 0 && t._1 == "select")
      .map(_._2).getOrElse(0)
    val lastEnd = opEnd(ops.last)
    val tailStart = toks.find(t => t._4 == 0 && t._2 >= lastEnd &&
        (t._1 == "order" || t._1 == "limit" || t._1 == "offset"))
      .map(_._2).getOrElse(sql.length)
    val sb = new StringBuilder(sql.substring(0, firstSelect))
    // a rewritten branch can swallow its surrounding whitespace, so
    // re-separate pieces only where a space is actually missing — an
    // untouched statement stays byte-identical
    def appendSep(s: String): Unit = {
      if (sb.nonEmpty && !sb.last.isWhitespace &&
        s.nonEmpty && !s.head.isWhitespace) sb.append(' ')
      sb.append(s)
    }
    var pos = firstSelect
    for (i <- ops) {
      appendSep(rewriteQualifyBlock(sql.substring(pos, toks(i)._2)))
      val e = opEnd(i)
      appendSep(sql.substring(toks(i)._2, e))
      pos = e
    }
    appendSep(rewriteQualifyBlock(sql.substring(pos, tailStart)))
    appendSep(sql.substring(tailStart))
    sb.toString
  }

  private def rewriteQualifyBlock(sql: String): String = {
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

  /** Applies f to the CONTENT of each outermost parenthesized region,
    * string-literal/quoted-identifier/comment-aware. Unbalanced input
    * passes through untouched (the right failure mode: Catalyst then
    * reports the real syntax error). */
  private def mapTopParens(sql: String)(f: String => String): String = {
    val n = sql.length
    // skip an opaque region starting at i (string/ident/comment); returns
    // the index after it, or i if none starts here
    def skipOpaque(i: Int): Int = {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        skipString(sql, i)
      } else if (c == '`') {
        var j = i + 1
        while (j < n && sql.charAt(j) != '`') j += 1
        math.min(j + 1, n)
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val j = sql.indexOf('\n', i); if (j < 0) n else j
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val j = sql.indexOf("*/", i + 2); if (j < 0) n else j + 2
      } else i
    }
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val afterOpaque = skipOpaque(i)
      if (afterOpaque > i) { sb.append(sql.substring(i, afterOpaque)); i = afterOpaque }
      else if (sql.charAt(i) == '(') {
        var depth = 1
        var j = i + 1
        while (j < n && depth > 0) {
          val ao = skipOpaque(j)
          if (ao > j) j = ao
          else {
            val cj = sql.charAt(j)
            if (cj == '(') depth += 1 else if (cj == ')') depth -= 1
            j += 1
          }
        }
        if (depth == 0) {
          sb.append('(').append(f(sql.substring(i + 1, j - 1))).append(')')
          i = j
        } else { sb.append(sql.substring(i)); i = n }
      } else { sb.append(sql.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
