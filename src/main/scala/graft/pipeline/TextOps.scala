package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, MinHash signatures, SimHash, language-ID
  * heuristic, quality scoring, fingerprinting. All pure codegen'd column
  * expressions — no UDFs, no state — so they run at full scan speed and
  * any engine (the DuckDB oracle included) can recompute them from the
  * same formulas.
  */
object TextOps {

  /** Whitespace tokens of the lower-cased text: the maximal nonempty
    * runs between `\s+` separators. The empty-string removal is what
    * makes the three tokenizer sites agree on texts with LEADING or
    * TRAILING whitespace (r12 ADVICE): SQL `trim` strips only spaces, so
    * `split(trim(lower(text)), "\\s+")` kept a phantom ""‑token on a
    * trailing `\n`/`\t` — present in real corpora everywhere — while the
    * compiled kernel ([[graft.functions.VectorKernels.shingleHashes]])
    * and the DuckDB oracle's `duckToks` each did their own thing. All
    * three now compute this same token list. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "\\s+"), "")

  /** BPE-ish subword pre-tokenization: letter runs, digit runs, and
    * single punctuation marks — the word-boundary split BPE vocabularies
    * train over (a stand-in for a learned merges table; the regex is the
    * deliberately engine-portable part). */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePattern), lit(0))

  /** Distinct word n-gram shingles (empty when fewer than n tokens).
    *
    * Built as n-1 nested `zip_with`s of the token array against its own
    * shifted slices, NOT as `transform(sequence(…), i => element_at(toks,
    * i+d))`. The distinction is the whole ballgame: `toks` is usually a
    * derived expression (`split(trim(lower(text)))`), and Catalyst's
    * projection collapse inlines it wherever referenced — a reference
    * INSIDE a lambda body is then re-evaluated per array element (the
    * element_at form re-ran the regex split 3× per shingle: 18.5 s at
    * sf0.1), while a reference as a HOF INPUT ARGUMENT is evaluated once
    * per row (this form: <1 s). `zip_with` pads the shorter side with
    * null and `concat` null-propagates, so the trailing (n-1) partial
    * grams come out null and are filtered. */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(filter(shinglesRaw(toks, n), g => g.isNotNull))

  /** POSITION-ALIGNED raw shingles: element i (0-based) is the n-gram
    * starting at token i, and the trailing n-1 slots are null — same
    * zip_with construction as [[shingles]] but without the distinct/
    * filter, for consumers that need where a gram sits (span removal). */
  def shinglesRaw(toks: Column, n: Int): Column =
    (2 to n).foldLeft(toks) { (acc, i) =>
      zip_with(acc, slice(toks, lit(i), greatest(size(toks) - (i - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }

  // MinHash and SimHash signatures are compiled Catalyst expressions —
  // see graft.functions.{MinHashSignatureExpr, SimHash64Expr}. Their
  // declarative aggregate/zip_with formulations ran on interpreted HOF
  // machinery and were 10-600× slower in the dedup hot paths.

  /** Stopword fraction — the language-ID heuristic's feature. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "this", "that", "be", "are", "or")

  def stopwordRatio(toks: Column): Column = {
    val stops = EnStopwords.map(lit(_))
    size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** n-gram-free language-ID heuristic: classify as English when the
    * stopword fraction clears the threshold. Kept for the oracle-simple
    * w-family queries; the REAL multilingual router is
    * [[graft.pipeline.LangId]] (char-n-gram multinomial NB, broadcast
    * (lang, gram, logp) model, scan-local scoring — p104). */
  def langIdEn(toks: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(toks) >= threshold, "en").otherwise("unk")

  /** Quality features: token count, char count, punctuation count,
    * mean token length. */
  def tokenCount(toks: Column): Column = size(toks).cast("long")
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()]", ""))).cast("long")
  def meanTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Document fingerprint: md5 of the whitespace-normalized text — an
    * exact-dedup key any engine can recompute. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  // ---- PII scrubbing -------------------------------------------------
  // Regexes are deliberately RE2-compatible (no backreferences or
  // lookaround) so the DuckDB oracle — and any RE2-based scanner at
  // ingest time — applies the exact same patterns. Scrub order is fixed
  // (email → phone → IPv4): each later pattern runs over the already-
  // redacted text, so engines agree even on overlapping matches.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Count occurrences of a PII pattern (pre-scrub). */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact emails, phone numbers, and IPv4 addresses with typed tags —
    * one codegen'd regexp_replace chain, scan-local at any scale. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Winnowing fingerprints (rolling-hash k-gram window minima): docs
    * sharing a substring of length ≥ w+k-1 share a fingerprint, making
    * the fingerprints a bucketable overlap-join key. Compiled kernel;
    * requires WinnowingExpr.register (done here via the active session). */
  def winnowingFingerprints(text: Column, k: Int = 24, w: Int = 8): Column = {
    graft.functions.WinnowingExpr.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_winnowing",
      regexp_replace(trim(lower(text)), "\\s+", " "), lit(k), lit(w))
  }
}
