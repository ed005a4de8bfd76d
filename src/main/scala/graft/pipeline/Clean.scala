package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al. 2020 §2.2 — the
  * heuristics used to distill Common Crawl into C4, plus RefinedWeb's
  * within-document line dedup).
  *
  * Everything here is SCAN-LOCAL: each document is cleaned from its own
  * text alone, so the operator is a single codegen'd projection — no
  * shuffle, no state, embarrassingly parallel at 100 TB. (The one C4 rule
  * that is NOT scan-local — dropping three-sentence spans repeated across
  * the corpus — is the cross-document problem; see Dedup.dupSpanProfile.)
  *
  * Line rules, applied in precedence order (a line is counted under the
  * FIRST rule it trips, so the per-rule counts partition the drops):
  *   1. boilerplate  — contains a line-level boilerplate needle
  *                     ("javascript", "cookie" — C4 drops any line with
  *                     the word javascript)
  *   2. too short    — fewer than `minWords` whitespace words (C4: 5)
  *   3. no terminal  — does not end in . ! ? or " (C4's terminal-
  *                     punctuation rule)
  *   4. duplicate    — an earlier KEPT-ELIGIBLE line in the same document
  *                     is identical (first occurrence wins; RefinedWeb-
  *                     style within-doc dedup)
  * Document rules: fewer than `minKeptLines` surviving lines, or the raw
  * text contains a document-level needle ("lorem ipsum", "{" — C4 drops
  * pages with code or placeholder text).
  *
  * The HOF-inlining discipline (see TextOps.shingles): `lines` and
  * `pass3` are materialized as real columns in separate selects and each
  * is referenced more than once downstream, which keeps CollapseProject
  * from inlining the split/filter back into every lambda element.
  */
object Clean {

  final case class C4Config(
      minWords: Int = 5,
      minKeptLines: Int = 3,
      lineBoiler: Seq[String] = Seq("javascript", "cookie"),
      docBoiler: Seq[String] = Seq("lorem ipsum", "{"),
      // per-doc line dedup is O(lines²) INSIDE one row; past this many
      // kept-eligible lines a single doc would stall its whole task
      dedupLineCap: Int = 10000,
      // true: raise_error on an over-cap doc (loud, job-fatal — the
      // right default for curated corpora where such a doc is a bug);
      // false: drop the doc IN-BAND instead — kept lines empty,
      // n_kept=0, doc_keep=false, n_dupline=-1 as the oversize marker —
      // so one pathological doc cannot abort a 100 TB corpus job
      failOnOversize: Boolean = true)

  /** HTML → text extraction — the ingest step BEFORE any of the line
    * rules ever run on a web crawl: drop script/style payloads, strip
    * tags, decode the entity shortlist, collapse whitespace. Pure
    * codegen'd regexp/replace chain: scan-local, zero shuffle.
    *
    * Every regex is RE2-compatible (no backreferences — script and style
    * blocks are two sequential replaces for exactly that reason — and no
    * lookaround), and each step is expressible verbatim in DuckDB, so
    * the oracle replays the identical chain and the extracted strings
    * hash-match byte-for-byte. Entity decode order is fixed with &amp;
    * LAST: decoding it earlier would double-decode "&amp;lt;" into "<",
    * which the HTML spec (and this chain) must leave as "&lt;". This is
    * the deterministic 95% extractor, not a DOM parser — malformed
    * nesting degrades to extra whitespace, never to an error. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    val amp = replace(ent, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** URL canonicalization — the crawl-frontier dedup step (the same
    * page arrives as HTTP://WWW.Example.COM:80/p?utm_source=x&b=2&a=1#f
    * and http://example.com/p?a=1&b=2; un-canonicalized they fetch and
    * dedup as different documents). Rules, in order:
    *   1. scheme and host lowercase; fragment dropped;
    *   2. default port stripped (:80 for http, :443 for https) and a
    *      leading www. removed;
    *   3. empty path → "/";
    *   4. query parameters: tracking params dropped (utm_*, gclid,
    *      fbclid, ref), the rest SORTED (param order is almost never
    *      semantic; sorting is what makes the key canonical);
    * then reassembled scheme://host path [?query].
    *
    * Scan-local decompose/rebuild via regexp_extract + higher-order
    * array functions — every step RE2- and DuckDB-portable (no
    * lookaround, no backreferences), so the oracle re-canonicalizes
    * identically. Malformed URLs (no scheme) pass through lowercased
    * host-less as-is rather than erroring — frontier hygiene must never
    * kill the job. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1))
    val path = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    // anchored before any '#': a '?' INSIDE the fragment is fragment
    // content (rule 1 drops it), not a query — the unanchored form
    // resurrected 'page#sec?x=1' as 'page?x=1' and split the dedup key
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val host0 = regexp_replace(hostport, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val keptParams = array_sort(filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("ref=") || (p === ""))))
    val q = array_join(keptParams, "&")
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(q === "", "").otherwise(concat(lit("?"), q))))
  }

  /** Per-document cleaning report + cleaned-text fingerprint. Output:
    * <idCol> (the caller's id column keeps its name, so the report joins
    * back without renaming), n_lines, n_boiler, n_short, n_nopunct,
    * n_dupline, n_kept, clean_chars, clean_md5, doc_keep. */
  def c4Lines(docs: DataFrame, idCol: String, textCol: String,
              cfg: C4Config = C4Config()): DataFrame = {
    def hasNeedle(c: Column, needles: Seq[String]): Column =
      needles.map(n => c.contains(n)).reduce(_ || _)
    def boiler(l: Column): Column = hasNeedle(lower(l), cfg.lineBoiler)
    // whitespace-stripping is load-bearing in BOTH rules: split keeps
    // the empty tokens a leading/trailing blank produces (a CRLF corpus
    // would over-count EVERY line's words by one, waving 4-word lines
    // past minWords), and a trailing space would fail the terminal-
    // punctuation test for a good sentence. regexp, not trim(): SQL trim
    // strips only ' ' — a leading TAB or trailing '\r' sails through it
    def strip(l: Column): Column = regexp_replace(l, "^\\s+|\\s+$", "")
    def words(l: Column): Column = size(split(strip(l), "\\s+"))
    def punct(l: Column): Column = strip(l).rlike("[.!?\"]$")

    docs
      .select(col(idCol), col(textCol).as("text"))
      .select(col(idCol), col("text"), split(col("text"), "\n").as("lines"))
      .select(
        col(idCol),
        hasNeedle(lower(col("text")), cfg.docBoiler).as("doc_boiler"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l => boiler(l))).cast("long").as("n_boiler"),
        size(filter(col("lines"), l => !boiler(l) && words(l) < cfg.minWords))
          .cast("long").as("n_short"),
        size(filter(col("lines"),
          l => !boiler(l) && words(l) >= cfg.minWords && !punct(l)))
          .cast("long").as("n_nopunct"),
        filter(col("lines"),
          l => !boiler(l) && words(l) >= cfg.minWords && punct(l)).as("pass3"))
      .select(
        col(idCol), col("doc_boiler"), col("n_lines"), col("n_boiler"),
        col("n_short"), col("n_nopunct"), col("pass3"),
        // first occurrence wins: a line survives iff its first index in
        // pass3 is its own index (array_position returns the FIRST match).
        // This is O(lines²) INSIDE one row — fine for real documents,
        // but an adversarial 100k-line doc would stall its whole task,
        // so the quadratic step is gated at cfg.dedupLineCap: loudly
        // (raise_error, the curated-corpus default) or in-band (the doc
        // is dropped with an oversize marker, the corpus job survives —
        // see C4Config.failOnOversize). Route line-dedup-at-scale
        // through globalLineDedup's exploded-aggregate shape instead.
        when(size(col("pass3")) > cfg.dedupLineCap,
          if (cfg.failOnOversize)
            raise_error(concat(lit("c4Lines: document with "),
              size(col("pass3")).cast("string"),
              lit(" kept-eligible lines exceeds the per-row dedup bound " +
                s"(${cfg.dedupLineCap}); split the doc or use " +
                "globalLineDedup")))
          else typedLit(Array.empty[String]))
          .otherwise(filter(col("pass3"),
            (l, i) => array_position(col("pass3"), l) === i + 1)).as("kept"))
      .select(
        col(idCol), col("n_lines"), col("n_boiler"), col("n_short"),
        col("n_nopunct"),
        // -1 marks an in-band oversize drop (kept is empty there, so the
        // plain difference would masquerade as "every line was a dup")
        when(size(col("pass3")) > cfg.dedupLineCap, lit(-1L))
          .otherwise((size(col("pass3")) - size(col("kept"))).cast("long"))
          .as("n_dupline"),
        size(col("kept")).cast("long").as("n_kept"),
        length(array_join(col("kept"), "\n")).cast("long").as("clean_chars"),
        md5(array_join(col("kept"), "\n")).as("clean_md5"),
        (size(col("kept")) >= cfg.minKeptLines && !col("doc_boiler"))
          .as("doc_keep"))
  }

  /** GLOBAL line dedup — the cross-document complement to [[c4Lines]]
    * (RefinedWeb §G / FineWeb's line-dedup pass): a line that occurs in
    * at least `maxDocs` DISTINCT documents is corpus boilerplate
    * (headers, footers, cookie banners) and is removed from every
    * document that carries it.
    *
    * Plan shape, 100 TB lens: one posexplode scan (output ∝ corpus
    * lines); distinct (line-hash, doc) pairs collapse within-doc
    * repeats BEFORE counting, so the count aggregate sees skinny
    * (32-char hash, id) rows with map-side partials; only the HOT
    * subset (n_docs ≥ maxDocs — a tiny fraction of the line vocabulary)
    * flows into the join back against the line stream, left as a
    * declarative left join so AQE broadcasts it when it fits and falls
    * back to a skinny hash join when a pathological corpus makes it
    * big. The rebuild is per-doc: sort_array over kept (pos, line)
    * structs — state bounded by one document's line count.
    *
    * Returns (<idCol>, n_lines, n_removed, n_kept, clean_md5). */
  def globalLineDedup(docs: DataFrame, idCol: String, textCol: String,
                      maxDocs: Int = 5): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"),
        // null text ≡ empty text (one "" line): posexplode of a null
        // array emits NOTHING and the doc would vanish from the report —
        // the 'never silently absent' convention Cli's spans verb pins
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("pos", "line")))
      .withColumn("lh", md5(col("line")))
    val hot = lines.select(col("lh"), col("id")).distinct()
      .groupBy("lh").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= maxDocs)
      .select(col("lh"), lit(true).as("hot"))
    lines.join(hot, Seq("lh"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("hot"), 1L).otherwise(0L)).as("n_removed"),
        // when() without otherwise is null on hot lines and collect_list
        // drops nulls — the kept array holds only surviving lines; the
        // struct sort key leads with pos, restoring document order
        // regardless of collect_list's arrival order
        sort_array(collect_list(when(col("hot").isNull,
          struct(col("pos"), col("line"))))).as("kept"))
      .select(col("id").as(idCol),
        col("n_lines"),
        col("n_removed"),
        (col("n_lines") - col("n_removed")).as("n_kept"),
        md5(array_join(transform(col("kept"), k => k.getField("line")), "\n"))
          .as("clean_md5"))
  }
}
