package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level language-model primitives for training-data pipelines:
  * BPE merge induction (the counting step of Sennrich et al. 2016 §3.2
  * — the most frequent adjacent symbol pair is the next merge) and a
  * unigram-LM cross-entropy score (the shape of CCNet's [Wenzek et al.
  * 2020] perplexity quality filter, with the corpus's own unigram model
  * standing in for the external KenLM).
  *
  * Both are classic two-phase corpus aggregates: explode the token
  * stream, aggregate skinny (token, count) rows with map-side partials,
  * then either top-k (merges) or broadcast the model back over the
  * corpus (scoring). Nothing here materializes pairs of documents and
  * no stage is quadratic.
  */
object Lm {

  /** Top-k BPE merge candidates: corpus-wide counts of ADJACENT pre-token
    * pairs (occurrences, not distinct-per-doc — BPE counts every
    * adjacency). The aggregate's key space is bounded by the observed
    * bigram vocabulary, so the shuffle is (pair, partial-count) rows —
    * at 100 TB this is the canonical wide-agg; the global top-k is a
    * TakeOrdered over the already-aggregated pair table, never a single-
    * partition sort of the raw stream. Ties break on the pair string so
    * any engine ranks identically. Returns (rank, pair, cnt). */
  def bpeMergeCandidates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = TextOps.bpeTokens(col(textCol))
    val pairs = docs
      .select(toks.as("t"))
      .select(explode(zip_with(col("t"),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .filter(col("pair").isNotNull)
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    pairs.orderBy(col("cnt").desc, col("pair"))
      .limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair"))).cast("long").as("rank"),
        col("pair"), col("cnt"))
  }

  /** Per-document unigram cross-entropy: avg_nll = mean over tokens of
    * −ln p(tok), with p from the corpus's own unigram counts — the
    * LM-quality-filter shape (an unusually high NLL marks gibberish,
    * boilerplate marks an unusually low one). The unigram model is a
    * (token, count) aggregate joined back BROADCAST (a unigram vocab is
    * megabytes even at web scale); the per-doc rollup is the only other
    * shuffle. Returns (id, n_toks, avg_nll). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val posts = docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
    val model = posts.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    posts.join(broadcast(model), "tok")
      .groupBy("id").agg(
        count(lit(1)).as("n_toks"),
        avg(-log(col("cnt").cast("double") / col("total").cast("double")))
          .as("avg_nll"))
  }
}
