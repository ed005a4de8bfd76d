package graft.pipeline

import org.apache.spark.sql.DataFrame
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

  /** Per-source token-distribution drift: KL(source ‖ corpus) over the
    * unigram distributions — the standard corpus-monitoring statistic for
    * spotting a source whose content shifted (scraper broke, boilerplate
    * flood, language drift) without reading any documents. KL is finite
    * here by construction: every source token is in the corpus by
    * definition, so p(w) > 0 wherever p_s(w) > 0. Two skinny (token,
    * count) aggregates — per-source and global — joined on token (the
    * global side is vocab-linear, so its broadcast hint is size-gated:
    * a web-corpus vocabulary is 10^8-10^9 tokens by Heaps' law), then one
    * per-source rollup. Returns (source, n_toks, kl). */
  def sourceDrift(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val posts = docs.select(col(srcCol).as("source"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      // split("") is [""] — an empty/whitespace doc must not mint a
      // phantom token into the distribution (the dsirLogWeights lesson)
      .filter(col("tok") =!= "")
    // totals as AGGREGATES joined back — never a window over the vocab
    // table: an empty-partition (or per-source) window funnels the whole
    // Heaps-law-unbounded vocabulary through single reducers, where the
    // aggregate form is a map-side-combinable shuffle of bounded rows
    // (one global row; one row per source) re-attached broadcast.
    val srcCounts = posts.groupBy("source", "tok").agg(count(lit(1)).as("c_s"))
    val srcTotals = srcCounts.groupBy("source").agg(sum(col("c_s")).as("n_s"))
    val globalCounts = posts.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = globalCounts.agg(sum(col("c")).as("n"))
    srcCounts
      .join(graft.operators.Broadcasts.sizeGated(srcTotals), "source")
      .join(graft.operators.Broadcasts.sizeGated(globalCounts), "tok")
      .crossJoin(broadcast(total))
      .groupBy("source").agg(
        max(col("n_s")).as("n_toks"),
        sum((col("c_s").cast("double") / col("n_s").cast("double")) *
          log((col("c_s").cast("double") / col("n_s").cast("double")) /
            (col("c").cast("double") / col("n").cast("double")))).as("kl"))
  }

  /** Apply induced merges (bpeMergeCandidates output) to the corpus:
    * classic greedy BPE encoding — repeatedly merge the adjacent pair
    * with the best (lowest) merge rank until no rule applies. The merge
    * CASCADE within one document is inherently sequential (each merge
    * changes which pairs exist), which is the one loop shape declarative
    * HOFs can't state — so this is an honest `mapPartitions` over
    * (id, pre-tokens) with the ranked merge table broadcast (same
    * justification as the multimodal codecs: per-row imperative work,
    * corpus-parallel, tiny shared state). Spec-verified rather than
    * oracle-gated: a per-document fixpoint loop is not SQL-expressible,
    * and the INDUCTION that feeds it (p33) is oracle-gated. Returns
    * (id, n_pre, n_encoded). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bRank = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long").as("id"),
        // NULL text tokenizes to a NULL array, which the typed decoder
        // and the merge loop both choke on — coalesce to empty (0 pre,
        // 0 encoded), matching how every explode-based sibling silently
        // drops null-text rows; ids that fail the long cast are dropped
        // for the same reason (the primitive decoder rejects null)
        coalesce(TextOps.bpeTokens(col(textCol)),
          array().cast("array<string>")).as("toks"))
      .filter(col("id").isNotNull)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rank = bRank.value
        it.map { case (id, toks) =>
          val seq = scala.collection.mutable.ArrayBuffer(toks: _*)
          var cont = seq.length > 1
          while (cont) {
            var bi = -1
            var br = Int.MaxValue
            var i = 0
            while (i < seq.length - 1) {
              val r = rank.getOrElse(seq(i) + " " + seq(i + 1), Int.MaxValue)
              if (r < br) { br = r; bi = i }
              i += 1
            }
            if (bi < 0) cont = false
            else {
              seq(bi) = seq(bi) + " " + seq(bi + 1)
              seq.remove(bi + 1)
            }
          }
          (id, toks.length.toLong, seq.length.toLong)
        }
      }.toDF("id", "n_pre", "n_encoded")
  }

  /** Per-document unigram cross-entropy: avg_nll = mean over tokens of
    * −ln p(tok), with p from the corpus's own unigram counts — the
    * LM-quality-filter shape (an unusually high NLL marks gibberish,
    * boilerplate marks an unusually low one). The unigram model is a
    * (token, count) aggregate joined back under a SIZE-GATED broadcast
    * hint (a unigram vocab obeys Heaps' law — small for most corpora,
    * tens of GB for a 100 TB web crawl, so the hint is measured, never
    * assumed); the per-doc rollup is the only other shuffle. Returns (id, n_toks, avg_nll). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val posts = docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      // empty-doc phantom token guard (see sourceDrift)
      .filter(col("tok") =!= "")
    // corpus total as a ONE-ROW aggregate crossJoin(broadcast(...)) —
    // the q58 discipline — not an empty-partition window over the vocab
    val model = posts.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = model.agg(sum(col("cnt")).as("total"))
    posts.join(graft.operators.Broadcasts.sizeGated(model), "tok")
      .crossJoin(broadcast(total))
      .groupBy("id").agg(
        count(lit(1)).as("n_toks"),
        avg(-log(col("cnt").cast("double") / col("total").cast("double")))
          .as("avg_nll"))
  }

  /** Interpolated BIGRAM cross-entropy (the KenLM-lite upgrade of
    * [[unigramNll]], Jelinek-Mercer smoothing):
    *
    *   p(w2 | w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/N
    *
    * — never zero because the unigram back-off covers every observed
    * token. Plan shape, 100 TB lens: the bigram stream is the same
    * position-aligned zip_with as bpeMergeCandidates (one scan, output
    * ∝ tokens); the bigram model joins back on the (w1, w2) pair key as
    * a SHUFFLE join — a corpus bigram table is NOT broadcast-safe,
    * unlike the unigram vocab, which joins back broadcast twice (c(w1)
    * and c(w2) sides). One per-doc rollup ends the plan.
    * Returns (id, n_bigrams, avg_nll); docs with <2 tokens emit no row. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                lambda: Double = 0.7): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      // empty-doc phantom token guard (see sourceDrift) — filtered in
      // the ARRAY so the pair stream and the unigram model agree
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("t"))
    val pairs = base.select(col("id"),
        explode(zip_with(col("t"),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = base.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // corpus token total N as a one-row aggregate, crossJoin(broadcast)
    // — never an empty-partition window over the Heaps-law vocab table
    val totalN = uni.agg(sum(col("c")).as("n"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // the unigram side joins back twice (back-off terms); size-gate ONCE
    // and reuse the persisted frame for both joins
    val uniG = graft.operators.Broadcasts.sizeGated(uni)
    pairs
      .join(bi, Seq("w1", "w2"))
      .join(uniG.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uniG.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totalN))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        avg(-log(
          lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
          lit(1.0 - lambda) * col("c2").cast("double") / col("n").cast("double")))
          .as("avg_nll"))
  }

  /** CCNet-style perplexity bucketing [Wenzek et al. 2020 §4.3]: score
    * every document against a PER-GROUP unigram model (CCNet scores each
    * language against that language's LM), then rank-split each group
    * into `nBuckets` equal tertiles — head/middle/tail — by ascending
    * NLL. The model is a (grp, token, count) aggregate (vocab × groups —
    * vocab-linear, so the broadcast hint is size-gated); the per-doc rollup is one skinny shuffle;
    * bucketing is a per-group window, parallel across groups. NLL is
    * rounded to 1e-6 BEFORE ranking so the rank order (and the `id`
    * tie-break) is engine-independent — fp summation-order noise sits
    * ~9 orders of magnitude below the rounding grain. At web scale,
    * where one group outgrows a sort partition, the drop-in swap is
    * approx_percentile cutoffs broadcast into a scan-local bucket
    * assignment; the rank form is kept here because CCNet defines
    * buckets by rank thirds and it is exactly restatable as SQL NTILE.
    * Returns (id, grp, nll, bucket ∈ 1..nBuckets). */
  def perplexityBuckets(docs: DataFrame, idCol: String, grpCol: String,
                        textCol: String, nBuckets: Int): DataFrame = {
    val posts = docs.select(col(idCol).as("id"), col(grpCol).as("grp"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      // empty-doc phantom token guard (see sourceDrift)
      .filter(col("tok") =!= "")
    // per-group totals as a bounded (one row per group) AGGREGATE joined
    // back — a per-group window over the model table would funnel the
    // dominant language's whole vocabulary through one reducer
    val model = posts.groupBy("grp", "tok").agg(count(lit(1)).as("cnt"))
    val totals = model.groupBy("grp").agg(sum(col("cnt")).as("total"))
    val nll = posts.join(graft.operators.Broadcasts.sizeGated(model),
        Seq("grp", "tok"))
      .join(graft.operators.Broadcasts.sizeGated(totals), "grp")
      .groupBy("id", "grp").agg(
        round(avg(-log(col("cnt").cast("double") / col("total").cast("double"))), 6)
          .as("nll"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("nll"), col("id"))
    nll.withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
  }

  /** BM25 top-k document retrieval (Robertson–Spärck Jones weighting,
    * Lucene's idf formulation ln(1 + (N − df + ½)/(df + ½))) for a
    * SMALL fixed query set — the lexical corpus-search/RAG-retrieval
    * baseline next to the ANN family. Plan shape, 100 TB lens: one
    * exploded scan feeds the (id, term, tf) aggregate with a per-doc
    * length window; the QUERY term table (a handful of rows) joins the
    * posting stream BROADCAST and prunes it to query-vocabulary matches
    * — the scored stream is a tiny fraction of the corpus — then df and
    * the (N, avgdl) scalars join back broadcast, one per-(query, doc)
    * rollup sums term contributions, and per-query top-k compiles to
    * WindowGroupLimit. Scores round to 1e-6 BEFORE ranking, ties break
    * on id, so any engine ranks identically.
    * Returns (query_id, rk ∈ 1..k, id, score). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, q) => q.trim.toLowerCase.split("\\s+").map(qid -> _) }
      .toDF("query_id", "term")
    val base = docs.select(col(idCol).as("id"),
      // empty-doc phantom token guard (see sourceDrift)
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("t"))
    // dl rides THROUGH the explode as a grouping column (functionally
    // dependent on id, so the groups are unchanged) — a per-id window
    // here would re-exchange the whole posting table once for dl and
    // again for the df branch that doesn't even need it
    val tf = base.select(col("id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    // df only matters for QUERY terms — restricting tf to the broadcast
    // query vocabulary BEFORE the df aggregate leaves a bounded table
    // (|query terms| rows), where the full-vocab df table is Heaps-law
    // unbounded; df per term is unchanged by the restriction
    val dfreq = tf.join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n"),
      avg(size(col("t")).cast("double")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val termScore = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("id"))
    tf.join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("s", termScore)
      .groupBy("query_id", "id").agg(round(sum(col("s")), 6).as("score"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("id"), col("score"))
  }

  /** Per-document top-k TF-IDF keywords — the classic corpus term-
    * weighting pass (smoothed idf = ln((N+1)/(df+1)) + 1, sklearn's
    * formulation, so no term ever gets weight 0). Three skinny
    * aggregates off one exploded token stream: (id, term, tf), per-doc
    * totals, and the document-frequency vocab — all map-side-combinable;
    * the df side joins back under a SIZE-GATED broadcast hint (a vocab is
    * Heaps-law unbounded; the one-row N side broadcasts unconditionally). Scores are rounded to 1e-6 BEFORE ranking, ties break
    * on the term string, so any engine ranks identically (fp noise sits
    * orders of magnitude below the rounding grain). The rank-limit
    * filter compiles to WindowGroupLimit in Spark 4 — partial top-k per
    * map partition, no full per-doc sort materializes.
    * Returns (id, rk ∈ 1..k, term, tfidf). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    // empty-doc phantom token guard + n_toks through the explode as a
    // grouping column — same two fixes as bm25TopK (the per-id window
    // re-exchanged the posting table for a value size(t) already knows)
    val base = docs.select(col(idCol).as("id"),
      filter(TextOps.tokens(col(textCol)), t => t =!= "").as("t"))
    val tf = base.select(col("id"), size(col("t")).cast("long").as("n_toks"),
        explode(col("t")).as("term"))
      .groupBy("id", "n_toks", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("tfidf").desc, col("term"))
    tf.join(graft.operators.Broadcasts.sizeGated(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        (col("tf").cast("double") / col("n_toks").cast("double")) *
          (log((col("n_docs").cast("double") + 1.0) /
               (col("df").cast("double") + 1.0)) + 1.0), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("id"), col("rk"), col("term"), col("tfidf"))
  }
}
