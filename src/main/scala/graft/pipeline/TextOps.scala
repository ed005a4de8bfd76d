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

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

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
  def shingles(toks: Column, n: Int = 3): Column = {
    val grams = (2 to n).foldLeft(toks) { (acc, i) =>
      zip_with(acc, slice(toks, lit(i), greatest(size(toks) - (i - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(grams, g => g.isNotNull))
  }

  /** MinHash signature: k independent hash slots, each the min of
    * xxhash64(slot, shingle) over the shingle set.
    *
    * Construction matters enormously here: `sh` must appear as the
    * AGGREGATE'S INPUT ARGUMENT (evaluated once per row), never inside a
    * lambda body — Catalyst's projection collapse inlines a referenced
    * column's defining expression, and an expression inside a lambda is
    * re-evaluated per element (k separate `array_min(transform(sh,…))`
    * slots measured 48 s, a `transform(seq(0,k), j -> …sh…)` nesting
    * 1277 s, this single-pass fold ~2 s at sf0.1). One pass over the
    * shingles, a k-slot running-min vector. */
  def minhashSignature(sh: Column, k: Int = 64, seed: Long = 7): Column =
    aggregate(sh, array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, j) => least(m, xxhash64(lit(seed), j, s))))

  /** 63-bit SimHash over the token multiset (bit 63 unused so the value
    * stays a positive signed long): bit b is set when the sum of ±1 votes
    * — sign of an independent per-bit hash of each token — is positive.
    * Single pass over the token array (one aggregate with a 63-slot
    * vote vector), fully codegen'd. */
  def simhash64(toks: Column, seed: Long = 11): Column = {
    val votes = aggregate(toks, array_repeat(lit(0L), 63),
      (acc, t) => zip_with(acc, sequence(lit(0), lit(62)),
        (a, b) => a + when(xxhash64(lit(seed), b, t) > 0, 1L).otherwise(-1L)))
    val powers = array((0 until 63).map(b => lit(1L << b)): _*)
    aggregate(zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

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
    * stopword fraction clears the threshold (synthetic corpora rarely
    * carry script signals; a real deployment swaps in per-language
    * stopword tables — same plan shape). */
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
}
