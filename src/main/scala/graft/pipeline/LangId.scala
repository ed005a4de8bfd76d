package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multilingual language identification: a char-n-gram multinomial
  * Naive-Bayes classifier — the router every multilingual corpus hits
  * before any per-language model (CCNet buckets per LANGUAGE; p40's
  * perplexity models are meaningless without this step upstream).
  *
  * Spark-first shape, 100 TB lens: the MODEL is a skinny
  * (lang, gram, logp) table — vocab-bounded (n-gram alphabet ×
  * languages, a few thousand rows for char bigrams), broadcast always —
  * and SCORING is scan-local: explode each doc's char n-grams once,
  * aggregate counts per (doc, gram), one broadcast join against the
  * model, one per-doc rollup, one per-doc argmax window. No shuffle
  * carries text. Every step (gram extraction via substr, add-one
  * smoothing, Σ cnt·logp, argmax) is restatable in DuckDB SQL, so the
  * p104 entry is value-checked end to end.
  *
  * Training uses add-one (Laplace) smoothing with a SHARED vocabulary
  * size V (distinct grams across the whole training input):
  * logp(g|ℓ) = ln((cnt(ℓ,g)+1)/(total(ℓ)+V)), and an out-of-vocabulary
  * gram scores the language's floor logp₀(ℓ) = ln(1/(total(ℓ)+V)).
  * Scores are rounded to 1e-6 before the argmax (house rule: fp
  * summation-order noise sits far below the rounding grain, so both
  * engines rank identically); ties break on language code.
  *
  * Replaces the English-only stopword heuristic `TextOps.langIdEn` as
  * the real router (the heuristic stays for the oracle-simple w-family
  * queries that use it).
  */
object LangId {

  /** Built-in seed corpus: one function-word-dense sentence per
    * language — the tiny bootstrap model for corpora with no labeled
    * data (a production deployment trains on labeled text via
    * [[trainNgramModel]]; same shapes). Seeds deliberately use only BMP
    * code points so char semantics agree across engines. */
  val Seeds: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox and the lazy dog are not in the house " +
      "with a friend of mine because it is that good for the children"),
    "de" -> ("der schnelle braune fuchs und der faule hund sind nicht in " +
      "dem haus mit einem freund von mir weil das doch gut für die kinder ist"),
    "es" -> ("el rápido zorro marrón y el perro perezoso no están en la " +
      "casa con un amigo mío porque eso es muy bueno para los niños"),
    "fr" -> ("le renard brun rapide et le chien paresseux ne sont pas dans " +
      "la maison avec un ami à moi parce que c'est très bien pour les enfants"),
    "zh" -> "敏捷的棕色狐狸和懒惰的狗不在房子里和我的一个朋友在一起因为这对孩子们来说是非常好的事情")

  /** Char n-grams of the whitespace-normalized, lower-cased text, as an
    * array column. Built shingles-style — the char array enters each
    * `zip_with` as a HOF INPUT ARGUMENT (evaluated once per row), never
    * referenced inside a lambda body (which projection collapse would
    * re-evaluate per element — the 18.5 s TextOps lesson). Grams are
    * plain substrings, so any engine re-derives them with substr. */
  def charGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    val cs = split(regexp_replace(trim(lower(text)), "\\s+", " "), "")
    val g = (2 to n).foldLeft(cs) { (acc, i) =>
      zip_with(acc, slice(cs, lit(i), greatest(size(cs) - (i - 1), lit(0))),
        (a, b) => concat(a, b))
    }
    // length guard does double duty: drops the null-padded trailing
    // slots AND the empty-string element split("") produces on empty text
    filter(g, x => x.isNotNull && length(x) === n)
  }

  /** Train the (lang, gram, logp, logp_oov) model from labeled text.
    * One exploded scan → bounded aggregates (model rows = langs × vocab;
    * totals = one row per lang; V = one scalar, joined back broadcast —
    * the q58 one-row-aggregate discipline). */
  def trainNgramModel(labeled: DataFrame, langCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val grams = labeled.select(col(langCol).as("lang"),
      explode(charGrams(col(textCol), n)).as("gram"))
    val counts = grams.groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("lang").agg(sum("cnt").as("total"))
    val vocab = counts.select("gram").distinct()
      .agg(count(lit(1)).as("v"))
    counts.join(graft.operators.Broadcasts.sizeGated(totals), "lang")
      .crossJoin(broadcast(vocab))
      .select(col("lang"), col("gram"),
        log((col("cnt") + 1).cast("double") /
          (col("total") + col("v")).cast("double")).as("logp"),
        log(lit(1.0) / (col("total") + col("v")).cast("double")).as("logp_oov"))
  }

  /** The bootstrap model over [[Seeds]]. */
  def seedModel(spark: SparkSession, n: Int = 2): DataFrame = {
    import spark.implicits._
    trainNgramModel(Seeds.toDF("lang", "text"), "lang", "text", n)
  }

  /** Per-(doc, lang) log-likelihood: Σ over the doc's grams of
    * cnt · logp(gram|lang), OOV grams at the language floor. Rounded to
    * 1e-6. Returns (id, lang, score). */
  def scores(docs: DataFrame, idCol: String, textCol: String,
             model: DataFrame, n: Int = 2): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(charGrams(col(textCol), n)).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
    // one floor row per language — a handful of rows, always broadcast
    val floors = model.select("lang", "logp_oov").distinct()
    // Σ cnt·coalesce(logp, logp_oov) over every (gram, lang) pair, but
    // WITHOUT fanning the gram stream out ×|langs| before aggregating
    // (r13, guide §2.3 — aggregate before you shuffle/fan out):
    //   score(id, lang) = Σ_matched cnt·(logp − logp_oov)
    //                   + (Σ_all cnt)·logp_oov(lang)
    // The matched part is an INNER join on the gram alone (each gram
    // meets only the languages that know it — a strict subset of the
    // old ×|langs| cross fan-out), and the floor term fans out over the
    // PER-DOCUMENT totals table (one row per doc), not the gram stream.
    // Same algebra, same 1e-6 rounding contract as before.
    val matched = grams
      .join(graft.operators.Broadcasts.sizeGated(
          model.select(col("lang"), col("gram"), col("logp"),
            col("logp_oov").as("f"))), Seq("gram"))
      .groupBy("id", "lang")
      .agg(sum(col("cnt") * (col("logp") - col("f"))).as("adj"))
    val totals = grams.groupBy("id").agg(sum(col("cnt")).as("n_g"))
    totals.crossJoin(broadcast(floors))
      .join(matched, Seq("id", "lang"), "left")
      .select(col("id"), col("lang"),
        round(coalesce(col("adj"), lit(0.0)) +
          col("n_g") * col("logp_oov"), 6).as("score"))
  }

  /** Argmax classification. Returns (id, lang_pred, score) — one row per
    * doc with at least one gram (an empty/whitespace doc has no evidence
    * and is the caller's routing decision, not a silent 'en'). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               model: DataFrame, n: Int = 2): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("lang"))
    scores(docs, idCol, textCol, model, n)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("id"), col("lang").as("lang_pred"), col("score"))
  }
}
