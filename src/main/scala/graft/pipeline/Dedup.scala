package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora, each designed so that NO
  * stage is O(n²) in the corpus: candidate generation always goes through
  * a banded/bucketed groupBy-shuffle, and exact verification runs only on
  * candidates.
  *
  *   - exact:     hash-groupBy on a normalized fingerprint
  *   - minhash:   shingle → k-slot MinHash → b bands of r rows →
  *                bucket join → exact-Jaccard verify (classic LSH;
  *                P(candidate) = 1-(1-s^r)^b)
  *   - simhash:   63-bit signature → 4×16-bit bands → bucket join →
  *                Hamming verify. For maxHamming ≤ 3 the recovery is
  *                EXACT by pigeonhole: 3 flipped bits cannot touch all
  *                4 bands, so every true pair shares at least one band.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n"), min(col("id")).as("keep_id"))

  /** Near-duplicate pairs (i < j, jaccard ≥ threshold) via banded
    * MinHash-LSH. Returns (i, j, jaccard). */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                   shingleN: Int = 3, seed: Long = 7): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // the banded postings are base's only consumer now (the verify tail
    // builds its own compiled hashed-shingle projection), so no persist
    val base = shingled(df, idCol, textCol, shingleN)
    val banded = minhashPostings(base, k, bands, seed)
    val a = banded.select(col("bkt"), col("id").as("i"))
    val b = banded.select(col("bkt"), col("id").as("j"))
    val candidates = a.join(b, Seq("bkt"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()

    verifyJaccard(candidates, df, idCol, textCol, shingleN, threshold)
  }

  /** MinHash (bucket, id) postings — candidates are the i<j pairs of a
    * self-join on `bkt`, so Σ c·(c−1)/2 over bucket sizes IS the
    * family's candidate volume (what ScalingSpec guards). The exchange
    * is load-bearing: it materializes each signature ONCE. Without it,
    * projection collapse inlines the minhash expression into the banding
    * lambda below and recomputes it per band element; with it, `sig` is
    * a bound attribute, and ReuseExchange shares the shuffle between the
    * two self-join branches. The signature itself is a native Catalyst
    * expression (see MinHashSignatureExpr). */
  private[pipeline] def minhashPostings(base: DataFrame, k: Int, bands: Int,
                                        seed: Long): DataFrame = {
    val r = k / bands
    graft.functions.MinHashSignatureExpr.register(base.sparkSession)
    val sigs = base
      .withColumn("sig", expr(s"graft_minhash_sig(sh, $k, $seed)"))
      .select("id", "sig")
      .repartition(col("id"))
    // band hash per (doc, band): the r signature slots of the band hashed
    // together — candidates are pairs sharing any (band, hash) bucket.
    sigs.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r)))))
        .as(Seq("band", "bandHash")))
      .select(struct(col("band"), col("bandHash")).as("bkt"), col("id"))
  }

  /** Exact-Jaccard verification only on candidate (i, j) pairs — shingles
    * re-joined by id so candidate generation never carries the shingle
    * arrays through its shuffle. */
  /** Exact shingle-Jaccard verification of candidate (i, j) pairs, the
    * dedup family's shared tail — rebuilt around three measured wins
    * (ProbeWinnow, ×10 corpus, 4.7M winnowing candidates, r12):
    *   - COMPILED hashed shingles (ShingleHashesExpr) instead of the
    *     interpreted zip_with string-shingle chain (~14 s → sub-second
    *     scan) — long surrogates also make array_intersect several
    *     times cheaper and shuffle 8-byte elements (the p80 lesson);
    *   - the EXACT size prefilter (t·|b| ≤ |a| ≤ |b|/t is necessary
    *     for J ≥ t) prunes candidates on two skinny joins BEFORE any
    *     array is fetched (4.7M → 3.1M pairs, 1.2 s);
    *   - |A∪B| from |A|+|B|−|A∩B| (arrays are distinct), halving the
    *     per-pair hash work vs a second array_union pass.
    * J over the surrogates equals J over the string shingles modulo
    * 64-bit collisions — the same equality ngramJaccardPairs' skinny
    * sh_h count rests on. */
  private def verifyJaccard(candidates: DataFrame, df: DataFrame,
                            idCol: String, textCol: String, shingleN: Int,
                            threshold: Double): DataFrame = {
    graft.functions.ShingleHashesExpr.register(df.sparkSession)
    // persisted: sizes and both verify sides read this projection
    val hashed = graft.operators.Broadcasts.trackedPersist(
      df.select(col(idCol).as("id"),
        call_function("graft_shingle_hashes", col(textCol), lit(shingleN))
          .as("shh"))
        .filter(size(col("shh")) > 0)
        .withColumn("n", size(col("shh"))))
    val pruned = candidates
      .join(hashed.select(col("id").as("i"), col("n").as("n_i")), "i")
      .join(hashed.select(col("id").as("j"), col("n").as("n_j")), "j")
      .filter(col("n_i").cast("double") >= lit(threshold) * col("n_j") &&
        col("n_j").cast("double") >= lit(threshold) * col("n_i"))
      .select("i", "j")
    pruned
      .join(hashed.select(col("id").as("i"), col("shh").as("sh_i"),
        col("n").as("n_i")), "i")
      .join(hashed.select(col("id").as("j"), col("shh").as("sh_j"),
        col("n").as("n_j")), "j")
      .withColumn("inter", size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_i") + col("n_j") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** EXACT n-gram Jaccard near-dup pairs via a shared-shingle inverted
    * index: any pair with jaccard ≥ t > 0 shares at least one shingle, so
    * pairs co-occurring under some shingle hash cover all true pairs —
    * the groupBy-shuffle bucket here is the shingle itself. Jaccard comes
    * straight from the co-occurrence COUNT (shingles are distinct per
    * doc, so shared-posting count = |A∩B| and J = inter/(|A|+|B|-inter))
    * — no shingle array is ever joined to a candidate, which is what
    * makes verification a skinny long-only aggregation (an array-join
    * verify measured 18.7 s at sf0.1; this counts in ~1 s). Complement to
    * minhashPairs: exact instead of probabilistic, candidate volume
    * driven by shingle document frequency. `dfCap > 0` drops shingles
    * appearing in more than dfCap docs — THE scale knob for 100 TB
    * corpora (ubiquitous shingles generate quadratic candidates and
    * carry no dedup signal), ON by default (1000: far above any real
    * near-dup cluster, so nothing is lost at small scale, while a
    * boilerplate shingle shared by millions of docs stays linear); a cap
    * undercounts intersections that include dropped shingles, so it
    * trades a bounded recall loss at the threshold boundary for linear
    * candidate growth. Pass dfCap = 0 for the exact-at-any-cost mode. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.5, shingleN: Int = 3,
                        dfCap: Int = 1000): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (J >= t > 0 implies a shared shingle)")
    // compiled hashed shingles; persisted because postings + the two
    // size joins all re-run the kernel over the corpus without it
    val base = hashedShingled(df, idCol, textCol, shingleN)
      .transform(graft.operators.Broadcasts.trackedPersist)
    val sized = base.select(col("id"), size(col("shh")).as("n"))
    // The exchange is load-bearing (same discipline as minhashPairs):
    // without it each side of the self-join below re-scans, re-explodes,
    // and re-filters the postings; with it the pipeline materializes
    // once, ReuseExchange shares the shuffle between both branches, and
    // the sh_h join is co-partitioned.
    val usable = shinglePostings(base, dfCap).repartition(col("sh_h"))
    val a = usable.select(col("sh_h"), col("id").as("i"))
    val b = usable.select(col("sh_h"), col("id").as("j"))
    val inter = a.join(b, "sh_h")
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sized.select(col("id").as("i"), col("n").as("n_i")), "i")
      .join(sized.select(col("id").as("j"), col("n").as("n_j")), "j")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_i") + col("n_j") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** (id, sh_h) postings with the document-frequency cap applied —
    * factored out so the cap's candidate-volume effect is testable:
    * candidates are exactly the i<j pairs of a postings self-join, so
    * the quadratic blow-up of an ubiquitous shingle is visible here.
    * Input is the [[hashedShingled]] projection — sh_h IS the compiled
    * shingle-hash surrogate, no per-posting string hash remains. */
  private[pipeline] def shinglePostings(base: DataFrame, dfCap: Int): DataFrame = {
    val posts = base.select(col("id"), explode(col("shh")).as("sh_h"))
    if (dfCap <= 0) posts
    else {
      // Anti-join against the HOT set, not inner-join against the rare
      // set: above-cap shingles are a tiny fraction of the key space
      // (that's why the cap works), where the rare set is the size of
      // the whole posting table. "Tiny fraction" is still only bounded
      // by postings/dfCap — unbounded in the corpus — so the hint is
      // size-gated: measured bytes under the cap → broadcast, else the
      // planner shuffles the anti-join.
      val hot = graft.operators.Broadcasts.sizeGated(
        posts.groupBy("sh_h").count()
          .filter(col("count") > dfCap).select("sh_h"))
      posts.join(hot, Seq("sh_h"), "left_anti")
    }
  }

  /** Winnowing (bucket, id) postings — the fingerprint IS the bucket
    * key; factored out so candidate volume is measurable (ScalingSpec). */
  /** Probe-visible alias of [[winnowingPostings]] (profiling main). */
  def winnowingPostingsProbe(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 24, w: Int = 8): DataFrame =
    winnowingPostings(df, idCol, textCol, k, w)

  private[pipeline] def winnowingPostings(df: DataFrame, idCol: String,
                                          textCol: String, k: Int = 24,
                                          w: Int = 8): DataFrame =
    df.select(col(idCol).as("id"),
      explode(TextOps.winnowingFingerprints(col(textCol), k, w)).as("bkt"))

  /** Shingled (id, sh) projection shared by the Jaccard family. */
  /** EXACT shingle-Jaccard pairs of a broadcast id-prefix probe against
    * the whole corpus — linear in the corpus, so it runs at ANY scale.
    * This is the truth set behind the dfCap'd [[ngramJaccardPairs]]'s
    * in-query losslessness gates (the p80/p28 discipline: where the
    * brute-force oracle is sf0.01-only, a bounded exact probe asserts
    * recall inside the run itself). The t·|b| ≤ |a| ≤ |b|/t size
    * prefilter is exact for J ≥ t. Returns (i, j) with i < probeMaxId,
    * i < j, J ≥ threshold. */
  def ngramJaccardProbeTruth(df: DataFrame, idCol: String, textCol: String,
                             probeMaxId: Long, threshold: Double,
                             shingleN: Int = 3): DataFrame = {
    val base = hashedShingled(df, idCol, textCol, shingleN)
    val pr = broadcast(base.filter(col("id") < probeMaxId)
      .select(col("id").as("i"), col("shh").as("sh_i")))
    base.select(col("id").as("j"), col("shh").as("sh_j"))
      .join(pr, col("i") < col("j") &&
        size(col("sh_i")).cast("double") >= lit(threshold) * size(col("sh_j")) &&
        size(col("sh_j")).cast("double") >= lit(threshold) * size(col("sh_i")))
      .withColumn("c", size(array_intersect(col("sh_i"), col("sh_j"))))
      .filter(col("c").cast("double") /
        (size(col("sh_i")) + size(col("sh_j")) - col("c")).cast("double")
        >= threshold)
      .select("i", "j")
  }

  /** Cross-frame variant of [[ngramJaccardProbeTruth]]: exact shingle
    * Jaccard between every probe-prefix doc of `probeSide` and every doc
    * of `corpusSide` — the truth set behind the banded incremental-index
    * path's recall gate. Returns (probe_id, corpus_id). */
  def crossJaccardProbeTruth(probeSide: DataFrame, corpusSide: DataFrame,
                             idCol: String, textCol: String,
                             probeMaxId: Long, threshold: Double,
                             shingleN: Int = 3): DataFrame = {
    val pr = broadcast(
      hashedShingled(probeSide, idCol, textCol, shingleN)
        .filter(col("id") < probeMaxId)
        .select(col("id").as("probe_id"), col("shh").as("sh_p")))
    hashedShingled(corpusSide, idCol, textCol, shingleN)
      .select(col("id").as("corpus_id"), col("shh").as("sh_c"))
      .join(pr,
        size(col("sh_p")).cast("double") >= lit(threshold) * size(col("sh_c")) &&
          size(col("sh_c")).cast("double") >= lit(threshold) * size(col("sh_p")))
      .withColumn("c", size(array_intersect(col("sh_p"), col("sh_c"))))
      .filter(col("c").cast("double") /
        (size(col("sh_p")) + size(col("sh_c")) - col("c")).cast("double")
        >= threshold)
      .select("probe_id", "corpus_id")
  }

  private[pipeline] def shingled(df: DataFrame, idCol: String, textCol: String,
                                 shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      TextOps.shingles(TextOps.tokens(col(textCol)), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)

  /** The COMPILED hashed twin of [[shingled]]: (id, shh array<long>) of
    * distinct shingle-hash surrogates straight from ShingleHashesExpr —
    * no interpreted zip_with string chain, no separate xxhash64 pass
    * (~14 s → sub-second over the ×10 corpus, ProbeWinnow r12). Every
    * consumer that needs only shingle IDENTITY (postings co-occurrence,
    * sizes, intersections) reads this; [[shingled]] remains for the
    * minhash signature path, whose landed indexes pin the string-keyed
    * hash arithmetic. */
  private[pipeline] def hashedShingled(df: DataFrame, idCol: String,
                                       textCol: String,
                                       shingleN: Int = 3): DataFrame = {
    graft.functions.ShingleHashesExpr.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      call_function("graft_shingle_hashes", col(textCol), lit(shingleN))
        .as("shh"))
      .filter(size(col("shh")) > 0)
  }

  /** Near-duplicate pairs via WINNOWING fingerprints: candidates are
    * pairs sharing ≥ minShared rolling-hash window-min fingerprints
    * (docs sharing any substring of length ≥ w+k-1 share one — at prose
    * defaults k=24/w=8 that's a 31-char run, which edit-style near-dups
    * always contain), then exact word-shingle Jaccard verifies. Same
    * bucket-join discipline as the other dedup family members — the
    * fingerprint IS the shuffle key; k is the selectivity dial (short k
    * fires on common phrases: k=8 produced 83k candidate pairs on 500
    * docs, k=24 produced 109 covering all 25 true pairs).
    *
    * `dfCap > 0` drops fingerprints appearing in more than dfCap docs —
    * the SAME scale knob as [[ngramJaccardPairs]]' shingle dfCap, for
    * the same reason: a boilerplate 31-char run shared by a corpus-scale
    * crowd generates quadratic candidates and carries no dedup signal.
    * Measured at the ×10 probe (r12, ProbeWinnow on the density-fixed
    * sf1 corpus): 9 fingerprints with df > 1000 carried 70% of the
    * 2.0·10⁷ candidate volume; the cap keeps 99.6% of postings and cuts
    * candidates to 6.0·10⁶. A capped-away candidate costs recall ONLY
    * for a pair whose every shared fingerprint is hot — true near-dups
    * (J ≥ t) share many — and verification stays exact, so precision is
    * untouched. At the test SFs max df ≈ 250, so the cap is a no-op and
    * oracle results are byte-identical. Pass dfCap = 0 for
    * exact-candidate mode. */
  def winnowingPairs(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.5, k: Int = 24, w: Int = 8,
                     minShared: Int = 1, dfCap: Int = 1000): DataFrame = {
    // persisted: the fingerprint kernel otherwise re-runs for the
    // hot-set aggregate AND each self-join side (3 corpus scans of the
    // rolling-hash + whitespace-normalize pass — the minhash/ngram
    // family persist discipline applied here too, r12)
    val fps = winnowingPostings(df, idCol, textCol, k, w)
      .transform(graft.operators.Broadcasts.trackedPersist)
    val usable =
      if (dfCap <= 0) fps
      else {
        // anti-join against the HOT set (the shinglePostings discipline):
        // above-cap fingerprints are a tiny fraction of the key space;
        // the hot-set broadcast is size-gated, never assumed
        val hot = graft.operators.Broadcasts.sizeGated(
          fps.groupBy("bkt").agg(count(lit(1)).as("df"))
            .filter(col("df") > dfCap).select("bkt"))
        fps.join(hot, Seq("bkt"), "left_anti")
      }
    // the exchange is load-bearing (ngramJaccardPairs discipline):
    // ReuseExchange shares one shuffle between both self-join branches
    // and the bkt join is co-partitioned
    val parted = usable.repartition(col("bkt"))
    val a = parted.select(col("bkt"), col("id").as("i"))
    val b = parted.select(col("bkt"), col("id").as("j"))
    val candidates = a.join(b, "bkt")
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select("i", "j")
    verifyJaccard(candidates, df, idCol, textCol, 3, threshold)
  }

  /** DECONTAMINATION: benchmark/eval probe docs detected inside a
    * training corpus via the same shared-shingle inverted index as
    * ngramJaccardPairs, but cross-set and ASYMMETRIC — the score is
    * containment |T∩E| / |E| (how much of the eval doc appears in the
    * training doc), the standard leakage metric: a long train doc that
    * embeds a whole eval item scores 1.0 where jaccard would dilute it.
    * The probe set (benchmark suites: thousands of docs) is broadcast,
    * so cost is one pass over the train postings + a candidate-only
    * aggregation — never train×eval. `dfCap` caps train-side shingle
    * document frequency exactly as in ngramJaccardPairs. Returns
    * (train_id, eval_id, n_common, overlap). */
  def contaminationPairs(train: DataFrame, probe: DataFrame, idCol: String,
                         textCol: String, threshold: Double = 0.5,
                         shingleN: Int = 3, dfCap: Int = 1000): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (overlap > 0 implies a shared shingle)")
    val tBase = hashedShingled(train, idCol, textCol, shingleN)
    val pBase = hashedShingled(probe, idCol, textCol, shingleN)
    val pSized = pBase.select(col("id").as("eval_id"), size(col("shh")).as("n_e"))
    val tPosts = shinglePostings(tBase, dfCap)
      .select(col("sh_h"), col("id").as("train_id"))
    val pPosts = shinglePostings(pBase, 0)
      .select(col("sh_h"), col("id").as("eval_id"))
    containmentTail(tPosts, pPosts, pSized, threshold)
  }

  /** Shared verify tail of the two contamination variants: candidate
    * co-occurrence counts → containment score → threshold. Factored so
    * the bloom path's "pair set ≡ exact" invariant cannot drift. */
  private def containmentTail(tPosts: DataFrame, pPosts: DataFrame,
                              pSized: DataFrame, threshold: Double): DataFrame = {
    val inter = tPosts.join(broadcast(pPosts), "sh_h")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("n_common"))
    inter.join(broadcast(pSized), "eval_id")
      .withColumn("overlap",
        col("n_common").cast("double") / col("n_e").cast("double"))
      .filter(col("overlap") >= threshold)
      .select("train_id", "eval_id", "n_common", "overlap")
  }

  /** Content-defined chunking (CDC): split every document at positions
    * where the trailing w-char window's rolling hash hits `H % div == 0`
    * (CdcBoundariesExpr — one compiled O(n) pass). Boundaries are
    * decided by CONTENT, not offset: an insertion early in a document
    * shifts every fixed-size chunk after it, but perturbs only the CDC
    * chunks whose windows overlap the edit — which is what makes
    * chunk-level dedup (shared-boilerplate detection, storage dedup)
    * robust to edits. Expected chunk length ≈ div chars.
    *
    * Scan-local end to end: boundary detection, chunk slicing, and
    * hashing all happen inside the row — NOTHING shuffles until a
    * consumer aggregates by chunk_md5, and that shuffle carries only
    * (md5, len) skinny rows if the consumer drops the text first.
    * Returns (doc_id, chunk_id, chunk_start, chunk_len, chunk_md5);
    * empty documents produce no rows, documents shorter than w produce
    * exactly one whole-document chunk. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                w: Int = 16, div: Long = 64): DataFrame = {
    graft.functions.CdcBoundariesExpr.register(
      org.apache.spark.sql.SparkSession.active)
    df.select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .withColumn("bs",
        call_function("graft_cdc_boundaries", col("t"), lit(w), lit(div)))
      // starts = 0 :: (b+1 for each boundary); ends = boundaries :: n-1.
      // The final (start > end) pair — text ending exactly on a boundary,
      // or an empty document — is filtered before explode.
      .withColumn("s_arr", concat(array(lit(0)), transform(col("bs"), _ + 1)))
      .withColumn("e_arr", concat(col("bs"), array(length(col("t")) - 1)))
      .withColumn("pr", filter(arrays_zip(col("s_arr"), col("e_arr")),
        p => p.getField("s_arr") <= p.getField("e_arr")))
      .select(col("doc_id"), col("t"), posexplode(col("pr")))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col.s_arr").cast("long").as("chunk_start"),
        (col("col.e_arr") - col("col.s_arr") + 1).cast("long").as("chunk_len"),
        md5(expr("substring(t, col.s_arr + 1, col.e_arr - col.s_arr + 1)"))
          .as("chunk_md5"))
  }

  /** Landed MinHash posting INDEX of a corpus: the (band, band_hash, id)
    * rows of minhashPostings flattened for parquet, each row stamped with
    * the banding parameters as a constant `params` struct (RLE/dictionary
    * encoding makes the column ~free on disk). The stamp is the index's
    * CONTRACT: a batch probed with different k/bands/seed/shingleN would
    * silently produce disjoint band hashes and near-zero candidates, so
    * incrementalMinhashPairs validates the stamp and fails loudly on a
    * mismatch instead. The point is INCREMENTAL ingestion: the existing
    * corpus is signature-banded once, and every future batch dedups
    * against the landed index without the corpus ever being re-scanned,
    * re-shingled, or re-hashed. */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 64, bands: Int = 16, shingleN: Int = 3,
                   seed: Long = 7): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    minhashPostings(shingled(df, idCol, textCol, shingleN), k, bands, seed)
      .select(col("bkt.band").as("band"), col("bkt.bandHash").as("band_hash"),
        col("id"),
        struct(lit(k).as("k"), lit(bands).as("bands"),
          lit(shingleN).as("shingle_n"), lit(seed).as("seed")).as("params"))
  }

  /** INCREMENTAL near-dup detection: a NEW batch checked against a
    * landed minhashIndex of the existing corpus. Plan costs, in corpus
    * terms: the new batch (a daily ingest, ≪ corpus) is the only side
    * that gets scanned/shingled/signed in full; the candidate join keys
    * the BATCH postings against the INDEX on (band, band_hash); and
    * exact-Jaccard verification re-shingles only the OLD DOCS THAT
    * APPEAR AS CANDIDATES (a semi-join prunes the corpus scan to them —
    * column pruning + the pushed id filter mean the text column is read
    * for candidate rows only). The batch's banding parameters are checked
    * against the index's embedded `params` stamp — a mismatch means the
    * band hashes can never collide and the result would be silently
    * empty, so it errors instead. Returns (new_id, old_id,
    * jaccard ≥ threshold). */
  def incrementalMinhashPairs(newDocs: DataFrame, index: DataFrame,
                              oldDocs: DataFrame, idCol: String, textCol: String,
                              k: Int = 64, bands: Int = 16,
                              threshold: Double = 0.5, shingleN: Int = 3,
                              seed: Long = 7): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // validate EVERY distinct stamp, not one sampled row: a mixed-params
    // index (two seeding writers racing, or an append with different
    // knobs) must fail here too — head(1) could sample the matching
    // partition and let the mismatched one silently contribute zero
    // candidates. The distinct aggregate is over an RLE'd constant
    // column: one skinny job, index-partition-count rows at most.
    val stamps = index
      .select("params.k", "params.bands", "params.shingle_n", "params.seed")
      .distinct().collect()
      .map(p => (p.getInt(0), p.getInt(1), p.getInt(2), p.getLong(3)))
    require(stamps.length <= 1,
      s"index carries ${stamps.length} DIFFERENT parameter stamps " +
        s"(${stamps.mkString(", ")}) — it was written by inconsistent " +
        "builders and must be rebuilt")
    stamps.foreach { stamped =>
      require(stamped == ((k, bands, shingleN, seed)),
        s"index was built with (k, bands, shingleN, seed) = $stamped but " +
          s"the batch uses (${(k, bands, shingleN, seed)}) — band hashes " +
          "would never collide; rebuild the index or match its parameters")
    }
    val newBase = shingled(newDocs, idCol, textCol, shingleN)
    val newPosts = minhashPostings(newBase, k, bands, seed)
      .select(col("bkt.band").as("band"), col("bkt.bandHash").as("band_hash"),
        col("id").as("new_id"))
    // candidates feed BOTH the old-doc semi-join and the final verify
    // join; the eager localCheckpoint computes the index join + distinct
    // ONCE (and truncates the plan) — its blocks are released by the
    // ContextCleaner when the result is dropped
    val candidates = newPosts
      .join(index.withColumnRenamed("id", "old_id"), Seq("band", "band_hash"))
      .select("new_id", "old_id").distinct().localCheckpoint()
    val oldCand = oldDocs.join(
      candidates.select(col("old_id").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
    // verify on compiled hashed surrogates (the verifyJaccard shape);
    // the minhash POSTINGS above keep string shingles — landed index
    // signatures pin that arithmetic
    val oldSh = hashedShingled(oldCand, idCol, textCol, shingleN)
      .select(col("id").as("old_id"), col("shh").as("sh_o"))
    val newSh = hashedShingled(newDocs, idCol, textCol, shingleN)
      .select(col("id").as("new_id"), col("shh").as("sh_n"))
    candidates.join(newSh, "new_id").join(oldSh, "old_id")
      .withColumn("inter", size(array_intersect(col("sh_n"), col("sh_o"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh_n")) + size(col("sh_o")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("new_id", "old_id", "jaccard")
  }

  /** Right-to-be-forgotten RETRACTION: delete a document set from a
    * LANDED minhashIndex without re-signing the surviving corpus — the
    * index is the only artifact rewritten, and the cost is one skinny
    * anti-join on id (the delete list is a takedown/GDPR batch, ≪
    * corpus, and broadcastable when small — left declarative for AQE).
    * The params stamp rides through untouched, so incremental ingest
    * against the retained index keeps working. The caller lands the
    * result and verifies no deleted id survives (the p52 query does,
    * loudly). */
  def retractFromIndex(index: DataFrame, deletes: DataFrame,
                       idCol: String): DataFrame =
    index.join(deletes.select(col(idCol).as("id")).distinct(),
        Seq("id"), "left_anti")
      // the join hoists the key column to the front; restore the index's
      // own column order so the rewritten artifact is schema-identical to
      // the one it replaces (readers pin positions as well as names)
      .select(index.columns.map(col).toIndexedSeq: _*)

  /** foreachBatch-compatible INCREMENTAL INGEST: dedup an arriving batch
    * against the landed corpus index, append the pair report, then grow
    * the index and corpus store with the batch itself — the maintenance
    * loop that makes minhashIndex a living structure rather than a
    * one-off export. First batch (no index yet) seeds the store. Only
    * batch-vs-corpus pairs are reported; in-batch duplicates are the
    * ordinary minhashPairs job a caller can run on the (small) batch.
    * Wire it as `stream.writeStream.foreachBatch((b, _) =>
    * Dedup.ingestBatch(b, ...))` — every path cost is batch-sized except
    * the candidate probe of the index. */
  def ingestBatch(batch: DataFrame, idCol: String, textCol: String,
                  corpusPath: String, indexPath: String, pairsPath: String,
                  k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                  shingleN: Int = 3, seed: Long = 7): Unit = {
    val spark = batch.sparkSession
    val hasIndex = try {
      spark.read.parquet(indexPath).schema.fieldNames.contains("band")
    } catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (hasIndex) {
      val pairs = incrementalMinhashPairs(batch, spark.read.parquet(indexPath),
        spark.read.parquet(corpusPath), idCol, textCol, k, bands, threshold,
        shingleN, seed)
      pairs.write.mode("append").parquet(pairsPath)
    }
    minhashIndex(batch, idCol, textCol, k, bands, shingleN, seed)
      .write.mode("append").parquet(indexPath)
    batch.write.mode("append").parquet(corpusPath)
  }

  /** BLOOM-PREFILTERED decontamination: same output as contaminationPairs
    * (bloom filters have no false negatives, so the pair set is identical
    * — the DuckDB oracle verifies that), but the train-side postings are
    * screened against a broadcast Bloom filter of the probe's shingle
    * hashes BEFORE the join. The 100 TB argument: the exact broadcast
    * join must probe a hash map of every eval posting for every train
    * posting; the bloom is a bit array `bitsPerKey` bits per eval shingle
    * (~2 MB per million shingles at 16 bits) — 10-50× smaller than the
    * posting map — and the 99%+ of train postings that match nothing are
    * eliminated by `numHashes` codegen'd bit tests without touching the
    * join at all. The filter is BUILT by a Spark aggregate (word-indexed
    * bit_or) with the same seeded-xxhash64 probe arithmetic the test
    * expression uses, so build and probe can never disagree; only the
    * m/64-word bit table is collected. */
  def bloomContaminationPairs(train: DataFrame, probe: DataFrame, idCol: String,
                              textCol: String, threshold: Double = 0.5,
                              shingleN: Int = 3, dfCap: Int = 1000,
                              bitsPerKey: Int = 16, numHashes: Int = 5): DataFrame = {
    require(threshold > 0, "threshold must be > 0 (overlap > 0 implies a shared shingle)")
    val tBase = hashedShingled(train, idCol, textCol, shingleN)
    val pBase = hashedShingled(probe, idCol, textCol, shingleN)
    // ONE cached probe posting set feeds the bloom build's two actions
    // and the returned plan's two probe-side consumers (the containment
    // join and the per-doc shingle counts — shingles are distinct per
    // doc, so count(postings) = |E|); the cache is RELEASED once the
    // build's actions are done (the lazy result then re-derives the
    // small-by-contract probe side rather than leaking a session-lifetime
    // cache entry per call)
    val pPosts = shinglePostings(pBase, 0)
      .select(col("sh_h"), col("id").as("eval_id")).cache()
    val pSized = pPosts.groupBy("eval_id").agg(count(lit(1)).as("n_e"))
    val pKeys = pPosts.select("sh_h").distinct()
    val nKeys = math.max(pKeys.count(), 1L)

    // m = bits, power of two so `& (m-1)` replaces mod; the k probe
    // indices are k INDEPENDENT hashes xxhash64(h, i) — re-hashing beats
    // the classic h1+i·h2 double-hashing here because Spark 4 runs ANSI
    // arithmetic (the multiply would overflow-error on uniform 64-bit
    // values) and xxhash64 is one codegen'd call either way
    val m = java.lang.Long.highestOneBit(
      math.max(nKeys * bitsPerKey * 2 - 1, 64L))
    def probeIdx(h: Column): Seq[Column] = (0 until numHashes).map(i =>
      xxhash64(h, lit(i)).bitwiseAND(lit(m - 1L)))

    val words = pKeys
      .select(explode(array(probeIdx(col("sh_h")): _*)).as("idx"))
      .select(expr("idx DIV 64").as("w"), expr("CAST(idx % 64 AS INT)").as("b"))
      .groupBy("w").agg(expr("bit_or(shiftleft(1L, b))").as("bits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pPosts.unpersist()
    val bitTable = Array.tabulate((m / 64).toInt)(i => words.getOrElse(i.toLong, 0L))
    val bitsLit = lit(bitTable)
    val pow2 = lit(Array.tabulate(64)(1L << _))
    val mayMatch = probeIdx(col("sh_h")).map { ix =>
      (element_at(bitsLit, (ix / 64).cast("long").cast("int") + 1)
        .bitwiseAND(element_at(pow2, (ix % 64).cast("int") + 1))) =!= 0L
    }.reduce(_ && _)

    val tPosts = shinglePostings(tBase, dfCap)
      .filter(mayMatch)
      .select(col("sh_h"), col("id").as("train_id"))
    containmentTail(tPosts, pPosts, pSized, threshold)
  }

  /** Cross-document DUPLICATED-SPAN profile (the line-oriented cousin of
    * Lee et al. 2022's suffix-array substring dedup, approximated at the
    * token-window level so it distributes): every `window`-token sliding
    * window is hashed, windows whose hash appears in ≥ 2 documents are
    * "duplicated spans", and each document reports what fraction of its
    * distinct windows is duplicated — the signal used to strip boilerplate
    * and verbatim-copied passages from training corpora. Plan shape:
    * explode → two skinny aggregates (per-window doc frequency, then
    * per-doc rollup) — NO pair materialization anywhere, so unlike the
    * pair-reporting dedup family this profile is linear in the corpus no
    * matter how pathological the duplication is. Spark groups on the
    * 64-bit xxhash64 of the window (a 100 TB shuffle carries 8-byte keys,
    * not 8-gram strings); the oracle groups on the window string itself —
    * the gate would catch a collision, and at 2^-64 per pair none occurs.
    * The doc frequency is a COUNT WINDOW over the posting partition, not
    * a groupBy re-joined onto the postings: the join shape scans and
    * re-builds the postings on both sides and shuffles three times
    * (measured 6.5 s at sf0.1 vs 3.5 s for this shape) — the window
    * needs the full posting rows shuffled by wh exactly once, which the
    * per-doc rollup's id shuffle then consumes. Returns (id, n_windows,
    * n_dup_windows, dup_frac). */
  def dupSpanProfile(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 8): DataFrame = {
    val posts = hashedShingled(df, idCol, textCol, window)
      .select(col("id"), explode(col("shh")).as("wh"))
    // shingles are distinct per doc, so the partition count = doc frequency
    val byWindow = org.apache.spark.sql.expressions.Window.partitionBy("wh")
    posts.withColumn("ndocs", count(lit(1)).over(byWindow))
      .groupBy("id").agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac", col("n_dup_windows").cast("double") /
        col("n_windows").cast("double"))
  }

  /** DUPLICATED-SPAN REMOVAL — the enforcement half of Lee et al. 2022's
    * substring dedup (dupSpanProfile is the measurement half): every
    * token covered by a `window`-token span that appears in ≥ 2 documents
    * is cut, and the document is rebuilt from the surviving tokens.
    * Overlapping duplicated windows merge naturally (a token is removed
    * if ANY covering window is duplicated). Plan: position-aligned window
    * postings → distinct-doc frequency (two skinny aggregates, map-side
    * partials) → per-doc duplicated-start lists (bounded by doc length)
    * joined back → a scan-local indexed filter rebuilds the text. No pair
    * materialization; linear in the corpus like the profile. Returns
    * (id, n_toks, n_removed, clean_md5). */
  def dupSpanRemoval(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextOps.tokens(col(textCol)).as("toks"))
    // (id, pos, wh): pos is 1-based token position of the window start
    val posts = base.select(col("id"),
        posexplode(TextOps.shinglesRaw(col("toks"), window)).as(Seq("pos0", "w")))
      .filter(col("w").isNotNull)
      .select(col("id"), (col("pos0") + 1).as("pos"), xxhash64(col("w")).as("wh"))
    // windows can repeat WITHIN a doc here, so doc frequency needs the
    // distinct (id, wh) projection before counting
    val docFreq = posts.select("id", "wh").distinct()
      .groupBy("wh").agg(count(lit(1)).as("ndocs"))
    val dupStarts = posts
      .join(docFreq.filter(col("ndocs") > 1).select("wh"), "wh")
      .groupBy("id").agg(collect_list(col("pos")).as("starts"))
    base.join(dupStarts, Seq("id"), "left")
      .select(col("id"), col("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("id"), col("toks"), col("starts"),
        // token at 1-based position i+1 survives unless a duplicated
        // window starting at s covers it (s ≤ i+1 < s+window)
        filter(col("toks"), (t, i) => !exists(col("starts"),
          s => s <= i + 1 && i + 1 < s + lit(window))).as("kept"))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_toks"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ")).as("clean_md5"))
  }

  /** SimHash signatures (id, sig) — compiled single-pass kernel
    * (one XXH64 per feature + 63 affine sign votes, see SimHash64Expr).
    * Features are word 3-SHINGLES, not unigram tokens: unigram features
    * are dominated by the corpus's shared vocabulary, so unrelated docs
    * get correlated signatures and band buckets cluster quadratically
    * (measured on the testdata corpus: 315k candidate pairs at 5000 docs
    * vs a 763-pair uniform-collision floor; shingle features put it back
    * near the floor — ScalingSpec pins the model). Shingle features are
    * the standard simhash practice for near-dup detection [Manku et al.,
    * WWW'07 use weighted multi-word features for the same reason]. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        seed: Long = 11): DataFrame = {
    graft.functions.VectorExprs.register(df.sparkSession)
    df.select(col(idCol).as("id"),
      call_function("graft_simhash64",
        TextOps.shingles(TextOps.tokens(col(textCol)), 3), lit(seed)).as("sig"))
  }

  /** Near-duplicate pairs by Hamming distance over SimHash signatures;
    * exact for maxHamming ≤ 3 (4 bands, pigeonhole). Returns (i, j, hamming). */
  def simhashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = simhashBanded(sigs)
    val a = banded.select(col("bkt"), col("id").as("i"), col("sig").as("sig_i"))
    val b = banded.select(col("bkt"), col("id").as("j"), col("sig").as("sig_j"))
    a.join(b, Seq("bkt"))
      .filter(col("i") < col("j"))
      .withColumn("hamming", bit_count(col("sig_i").bitwiseXOR(col("sig_j"))))
      .filter(col("hamming") <= maxHamming)
      .select("i", "j", "hamming").distinct()
  }

  /** SimHash (bucket, id, sig) postings: 4 × 16-bit bands (pigeonhole:
    * any pair at hamming ≤ 3 agrees on ≥ 1 whole band) — factored out so
    * candidate volume is measurable (ScalingSpec). */
  private[pipeline] def simhashBanded(sigs: DataFrame): DataFrame = {
    val nBands = 4
    sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until nBands).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bandVal")))
      .select(struct(col("band"), col("bandVal")).as("bkt"), col("id"), col("sig"))
  }

  /** Canonical-keep — the DECISION half of near-dup dedup: given cluster
    * labels (v, lbl) from connected components and a per-doc quality
    * score, keep exactly one doc per cluster (best score, ties to the
    * smallest id — the deterministic argmax). One skinny join to attach
    * scores + one per-cluster window over (v, lbl, score) rows; dedup
    * clusters are small by construction (they are near-DUPLICATES), so
    * the window partitions stay tiny at any corpus size. Any scalar
    * quality column plugs in as the score (length, Gopher keep-score,
    * unigram NLL…). Returns (doc_id, cluster, score, keep). */
  def canonicalKeep(labels: DataFrame, docs: DataFrame, idCol: String,
                    scoreCol: String): DataFrame = {
    // the score column keeps its ORIGINAL type in the output, but the
    // argmax ranks on its double view — a long cast would truncate the
    // fractional scores the contract advertises (a Gopher keep-score in
    // [0,1] would rank every cluster as all-ties and "keep" the
    // smallest id regardless of quality)
    val scored = labels.join(
      docs.select(col(idCol).cast("long").as("v"), col(scoreCol).as("score")),
      "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lbl").orderBy(col("score").cast("double").desc, col("v"))
    scored.select(col("v").as("doc_id"), col("lbl").as("cluster"),
      col("score"), (row_number().over(w) === 1).as("keep"))
  }

  /** Measured storage footprint of an eager localCheckpoint, read
    * straight off the block manager (memSize + diskSize of the backing
    * RDD) — NO extra Spark job. None when the frame is not a
    * materialized checkpoint. */
  private def checkpointBytes(df: DataFrame): Option[Long] = {
    val sc = df.sparkSession.sparkContext
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.flatMap(id => sc.getRDDStorageInfo.find(_.id == id))
      .map(i => i.memSize + i.diskSize)
  }

  /** [[checkpointBytes]] restricted to frames that ARE a materialized
    * checkpoint (possibly under row-preserving Project/alias nodes): a
    * checkpoint buried under joins/explodes says nothing about the bytes
    * of the DERIVED frame, so it must not gate a collect of it. */
  private def directCheckpointBytes(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, c) => strip(c) // 1:1 rows by construction
      case SubqueryAlias(_, c) => strip(c)
      case other => other
    }
    strip(df.queryExecution.analyzed) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        df.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id).map(i => i.memSize + i.diskSize)
      case _ => None
    }
  }

  /** Join-strategy decision for the node-bounded side of an iterative
    * round (labels, per-node minima): broadcast hint iff the measured
    * size fits the configured
    * [[graft.operators.Broadcasts.MaxBytesConf]] cap (tests set it to 0
    * to force the shuffle path). Measured once per loop, not per round —
    * node count never grows across CC iterations. When `nodeTable` is an
    * already-materialized localCheckpoint the size comes off the block
    * manager for free (VERDICT r8 item 4 — no extra count() job);
    * deserialized checkpoint rows are at least UnsafeRow-sized, so the
    * byte gate errs toward withholding the hint, never a bad broadcast.
    * A non-checkpoint frame falls back to count() × 48 B/row. */
  private def hintIfNodeBounded(nodeTable: DataFrame): DataFrame => DataFrame = {
    val spark = nodeTable.sparkSession
    val cap = spark.conf.getOption(graft.operators.Broadcasts.MaxBytesConf)
      .map(_.toLong).getOrElse(graft.operators.Broadcasts.DefaultMaxBytes)
    val fits = checkpointBytes(nodeTable) match {
      case Some(bytes) => bytes <= cap
      case None => nodeTable.count() * 48L <= cap
    }
    if (fits) broadcast(_) else identity
  }

  /** Release the executor-local blocks behind an eager localCheckpoint
    * once a newer round's checkpoint has consumed them. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  // ---- LOCAL (driver union-find) CC fast path -------------------------
  // Both CC strategies broadcast their node-bounded label/minima tables
  // EVERY ROUND when the measured edge bytes fit the hint cap — so for a
  // graph that small, the component structure is bounded driver metadata
  // by the same argument, and a single O(E·α(E)) union-find replaces
  // 5–10 distributed rounds (each round: broadcast builds + a checkpoint
  // materialization + a convergence aggregate — measured ~0.4–0.6 s of
  // pure fixed cost per round at sf0.1, data volume irrelevant). The
  // gate is MEASURED, never assumed: checkpoint bytes when the input is
  // already materialized (free, off the block manager), else the bytes
  // of the canonical edge checkpoint the loop was about to build anyway
  // — so the local path never adds a recompute of a heavy pair plan.
  // Past the cap the distributed loops run unchanged (the 100 TB path).
  // Both strategies converge to the component-minimum label, and so does
  // union-find — CurationSpec pins the three-way equality as a law.

  /** Conf key for the local-CC byte cap; 0 forces the distributed loop
    * (specs exercising loop semantics set it). */
  val CcLocalMaxBytesConf = "graft.cc.localMaxBytes"

  /** Default local-CC cap: 64 MB of measured checkpoint bytes (≈2M edge
    * rows) — far under driver heap, and a size where the distributed
    * loop's per-round fixed costs dwarf the collect. */
  val CcLocalDefaultMaxBytes: Long = 64L << 20

  private def ccLocalCap(df: DataFrame): Long =
    df.sparkSession.conf.getOption(CcLocalMaxBytesConf).map(_.toLong)
      .getOrElse(CcLocalDefaultMaxBytes)

  /** Union-find over collected (a, b) rows → (node, component-min) pairs.
    * `selfNodes`: register a row's non-null endpoints as nodes even when
    * the row is a self-loop / half-null (mirrors the min-label loop's
    * self-loop construction; the alternating loop drops such rows and
    * passes pre-filtered input). Path-halving find + union-by-size. */
  private[pipeline] def unionFindLabels(rows: Array[org.apache.spark.sql.Row])
      : Array[(Long, Long)] = {
    val idx = new java.util.HashMap[java.lang.Long, Integer](rows.length * 2)
    val nodes = new scala.collection.mutable.ArrayBuffer[Long](rows.length)
    def nodeId(x: Long): Int = {
      val got = idx.get(x)
      if (got != null) got.intValue()
      else { val n = nodes.length; idx.put(x, n); nodes += x; n }
    }
    // first pass registers nodes so the parent array can size once
    var r = 0
    val ab = new Array[Int](rows.length * 2)
    while (r < rows.length) {
      val row = rows(r)
      val ai = if (row.isNullAt(0)) -1 else nodeId(row.getLong(0))
      val bi = if (row.isNullAt(1)) -1 else nodeId(row.getLong(1))
      ab(2 * r) = ai; ab(2 * r + 1) = bi
      r += 1
    }
    val parent = Array.tabulate(nodes.length)(identity)
    val size = Array.fill(nodes.length)(1)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    r = 0
    while (r < rows.length) {
      val ai = ab(2 * r); val bi = ab(2 * r + 1)
      if (ai >= 0 && bi >= 0 && ai != bi) {
        val ra = find(ai); val rb = find(bi)
        if (ra != rb) {
          if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
          else { parent(ra) = rb; size(rb) += size(ra) }
        }
      }
      r += 1
    }
    // component minimum per root, then one labeling pass
    val minOf = new Array[Long](nodes.length)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    var i = 0
    while (i < nodes.length) {
      val root = find(i)
      if (nodes(i) < minOf(root)) minOf(root) = nodes(i)
      i += 1
    }
    val out = new Array[(Long, Long)](nodes.length)
    i = 0
    while (i < nodes.length) { out(i) = (nodes(i), minOf(find(i))); i += 1 }
    out
  }

  /** Build the (v, lbl) label frame from local union-find output. The
    * frame is provably under the local cap (it was just collected), so
    * it carries the broadcast hint every consumer join wants; parallelize
    * (not a LocalRelation literal) keeps large label sets out of the
    * logical plan. */
  private def labelsFrame(spark: org.apache.spark.sql.SparkSession,
                          labels: Array[(Long, Long)]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("lbl", LongType, nullable = false)))
    val slices = math.max(1, labels.length / 500000)
    val rdd = spark.sparkContext.parallelize(
      labels.toIndexedSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), slices)
    broadcast(spark.createDataFrame(rdd, schema))
  }

  /** Connected components over near-dup PAIRS → per-doc cluster labels
    * (label = min doc id in the component) — the step that turns a pair
    * report into actionable dedup: one canonical keep per cluster,
    * everything else dropped. Min-label propagation: each round every
    * node takes the min of its own and its neighbors' labels; rounds
    * needed = component diameter, and near-dup components are
    * SMALL-DIAMETER by construction (members all resemble the same
    * text), so the loop converges in a handful of bounded-size joins —
    * each one a skinny (node, label) shuffle. ONE action per round: the
    * aggregate that reads the did-anything-improve bit also materializes
    * the round's cache (r5 review: isEmpty + count was two jobs).
    * (Web-scale graphs with long chains want large-star/small-star
    * [Kiveris et al.]; for dedup clusters the simple propagation IS the
    * right cost.) */
  /** NOTE on the local fast path vs the `maxIter`/`allowPartial`
    * contract (ADVICE r13): maxIter bounds the DISTRIBUTED loop's round
    * count — it is a resource budget, not a semantic truncation knob.
    * Under the measured size gate the union-find returns the same
    * converged labels the loop would have reached, without consuming
    * rounds, so a small-maxIter call can succeed on a small input where
    * a big input would throw non-convergence. Callers that specifically
    * exercise loop semantics (round budgets, allowPartial) must force
    * the loop with `graft.cc.localMaxBytes = 0`, as the specs do. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          allowPartial: Boolean = false): DataFrame = {
    // localCheckpoint, not cache: each round's output feeds the next
    // round's join AND the convergence aggregate, so without truncation
    // the LOGICAL plan doubles per iteration — cache keeps the data but
    // not the plan, and a window-heavy pairs input (e.g.
    // prefixJaccardPairs) OOMs the analyzer within a handful of rounds
    // (bitten in round 6, p86). Eager checkpoints truncate lineage each
    // round; superseded blocks are released explicitly so peak storage
    // is two label sets.
    //
    // Round shape (r9): the edge set carries SELF-LOOPS, so one
    // broadcast join + one min-aggregate computes
    //   newLbl(v) = min over (Γ(v) ∪ {v}) of lbl
    // directly — fusing r8's three stages (neighbor-min aggregate,
    // join-back, least) into one shuffle. Convergence is read off the
    // new checkpoint alone: labels only ever DECREASE, so any
    // improvement strictly decreases the exact decimal label sum — no
    // old-vs-new comparison join, one tiny aggregate per round.
    val base = pairs.select(col("i").cast("long").as("a"),
      col("j").cast("long").as("b"))
    // LOCAL fast path, gate 1 (free): the caller handed us an already-
    // materialized checkpoint whose measured bytes fit the local cap —
    // collect it and union-find on the driver (see the block comment
    // above unionFindLabels). Half-null rows register their non-null
    // endpoint as an isolated node, mirroring the self-loop construction.
    val cap = ccLocalCap(pairs)
    if (directCheckpointBytes(pairs).exists(_ <= cap))
      return labelsFrame(pairs.sparkSession, unionFindLabels(base.collect()))
    val sym = base.unionByName(
      base.select(col("b").as("a"), col("a").as("b")))
    val edges = sym.unionByName(sym.select(col("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    // LOCAL fast path, gate 2: the canonical edge checkpoint the loop
    // needs anyway just materialized — its measured bytes are free, and
    // collecting its blocks recomputes nothing.
    if (checkpointBytes(edges).exists(_ <= cap)) {
      val rows = edges.collect()
      releaseCheckpoint(edges)
      return labelsFrame(pairs.sparkSession, unionFindLabels(rows))
    }
    // Per-round join strategy, decided ONCE from the measured CHECKPOINT
    // bytes (free, off the block manager): label tables are node-bounded
    // and strictly smaller than the edge set, so edges-under-cap ⇒
    // labels broadcastable; past the cap (a 100 TB corpus has
    // corpus-linear nodes) no hint is applied and the planner shuffles.
    val bcast = hintIfNodeBounded(edges)
    var labels = edges.filter(col("a") === col("b"))
      .select(col("a").as("v"), col("a").as("lbl"))
    var prevCk: Option[DataFrame] = None
    var prevSum: Option[java.math.BigDecimal] = None
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // propagate: newLbl(v) = min over (Γ(v) ∪ {v}) of lbl
      val prop = edges.join(bcast(labels), edges("b") === labels("v"))
        .groupBy(edges("a").as("v")).agg(min(col("lbl")).as("lbl"))
      // shortcut (pointer doubling): lbl(v) ← lbl(lbl(v)). Labels obey
      // lbl(u) ≤ u, so shortcutting also only decreases; propagate
      // alone needs one round per hop of component diameter (a
      // 190k-pair near-dup graph at sf0.1 measured ELEVEN rounds —
      // chained similarity builds long paths), compression halves the
      // remaining diameter per round → O(log d) rounds. The doubled
      // reference to `prop` reuses the same shuffle exchange
      // (ReuseExchange); both join sides are node-bounded.
      // LAZY checkpoint: the convergence aggregate right below is the
      // round's first action, so ONE job materializes the checkpoint
      // blocks AND reads the label sum (eager would spend a separate
      // materialization job per round — measured 2 jobs/round → 1).
      // ONE shortcut hop per round: a second compress was measured
      // (6 → 5 rounds on the sf0.1 diameter-10 graph) but the extra
      // node-table self-join cost MORE than the round it saved
      // (2.7 → 3.7 s warm) — the doubled `prop` reference recomputes
      // past the reused exchange.
      val updated = prop.as("x")
        .join(bcast(prop.select(col("v").as("cv"), col("lbl").as("clbl"))),
          col("x.lbl") === col("cv"), "left")
        .select(col("x.v").as("v"),
          coalesce(col("clbl"), col("x.lbl")).as("lbl"))
        .localCheckpoint(false)
      val s = updated.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
        .getDecimal(0)
      // null sum means zero rows — trivially converged
      converged = s == null || prevSum.exists(_.compareTo(s) == 0)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"CC round=$it sum=$s converged=$converged")
      prevCk.foreach(releaseCheckpoint)
      prevCk = Some(updated)
      prevSum = Some(s)
      labels = updated
      it += 1
    }
    releaseCheckpoint(edges)
    // non-convergence means labels are WRONG (far ends of a >maxIter-
    // diameter chain still carry non-minimal labels) — fail loudly
    // unless the caller opted into the partial result
    require(converged || allowPartial,
      s"connectedComponents did not converge in $maxIter iterations " +
        "(component diameter exceeds maxIter); raise maxIter or pass allowPartial")
    labels
  }

  /** Connected components by ALTERNATING LARGE-STAR/SMALL-STAR
    * [Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014] — the WEB-SCALE path that min-label propagation
    * (connectedComponents above) is not: propagation needs one round per
    * hop of component diameter, so a million-node chain needs a million
    * rounds; star contraction rewires every node toward its neighborhood
    * minimum and provably converges in O(log² n) rounds (O(log n) in
    * practice) REGARDLESS of diameter. Use this when components can be
    * long and stringy (web link graphs, co-citation chains); min-label
    * stays the cheaper choice for small-diameter near-dup clusters.
    *
    * Both phases are one groupBy + one join on skinny (node, node) rows:
    *   large-star: each node u points its LARGER neighbors at
    *               m(u) = min(Γ(u) ∪ {u})
    *   small-star: each node u points its SMALLER neighbors (and itself)
    *               at the minimum of those
    * Converged when the edge multiset is stable; then every edge is
    * (v, component-min) — a star — and the labels fall out directly.
    * Convergence is ONE action per round: the (count, hash-xor) signature
    * of the new edge set, compared to the previous round's (xor is
    * order-independent and cannot overflow; edges are distinct, so xor
    * cancellation needs a full hash collision). */
  def connectedComponentsAlternating(pairs: DataFrame, maxIter: Int = 30,
                                     allowPartial: Boolean = false): DataFrame = {
    // per-node minima tables are node-bounded — same measured broadcast
    // gate as connectedComponents (decided once; see hintIfNodeBounded)
    var bcast: DataFrame => DataFrame = identity
    // Each round is largeStar ∘ smallStar with ONE dedup at the end:
    // largeStar emits strictly-oriented rows (a > b: it attaches only
    // larger neighbors to the per-node minimum, and m < b by
    // construction), so smallStar's textbook greatest/least
    // canonicalization is a no-op here, and intermediate duplicates ride
    // to smallStar's single closing distinct — dropping two of the five
    // per-round shuffles the literal formulation pays. Duplicate volume
    // between the dedups is bounded by the symmetrized edge set.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a"), col("b"))
        .unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy("a").agg(min(col("b")).as("nmin"))
        .select(col("a"), least(col("a"), col("nmin")).as("m"))
      sym.join(bcast(mins), "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
    }
    // PRECONDITION (local helper): `e` is largeStar output — oriented
    // a > b, self-loop-free, possibly with duplicate rows.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("a").agg(min(col("b")).as("m"))
      e.join(bcast(mins), "a")
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .unionByName(mins.select(col("a"), col("m").as("b")))
        .distinct()
    }
    // each phase references the edge set FOUR times (symmetrize + join
    // back onto the per-node minima), so the logical plan grows ~16× per
    // round — cache alone keeps the DATA but not the plan, and ten rounds
    // of that OOMs the planner. localCheckpoint (eager) truncates lineage
    // every round: executor-local blocks, no reliable-storage round trip;
    // a multi-hour production run on preemptible executors would swap in
    // checkpoint() against the cluster checkpoint dir — same plan shape.
    // The superseded round's checkpoint blocks are released explicitly
    // (the eager checkpoint of `next` has already consumed them) so peak
    // storage is two edge sets, not one per round.
    // LOCAL fast path (same two measured gates as connectedComponents;
    // this strategy's node universe is endpoints of a≠b rows only, so
    // the collected rows are pre-filtered to match the loop's edges)
    val cap = ccLocalCap(pairs)
    val prefiltered = pairs
      .select(col("i").cast("long").as("a"), col("j").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    if (directCheckpointBytes(pairs).exists(_ <= cap))
      return labelsFrame(pairs.sparkSession,
        unionFindLabels(prefiltered.collect()))
    var edges = pairs
      .select(col("i").cast("long").as("a"), col("j").cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    if (checkpointBytes(edges).exists(_ <= cap)) {
      val rows = edges.collect()
      releaseCheckpoint(edges)
      return labelsFrame(pairs.sparkSession, unionFindLabels(rows))
    }
    // gate on the EDGE checkpoint's measured bytes (free, off the block
    // manager): the per-node minima tables are strictly smaller than the
    // edge set (grouped per node, skinnier rows), so edges-under-cap ⇒
    // minima-under-cap; edges-over-cap conservatively shuffles even if
    // the node table alone would fit — never a bad broadcast, and no
    // distinct+count job just to size the hint
    bcast = hintIfNodeBounded(edges)
    var sig = (-1L, -1L)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // lazy: the signature aggregate is the round's first action, so
      // one job materializes the checkpoint AND reads the signature
      val next = smallStar(largeStar(edges)).localCheckpoint(false)
      val row = next.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L))).head()
      val nextSig = (row.getLong(0), row.getLong(1))
      releaseCheckpoint(edges)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    require(converged || allowPartial,
      s"connectedComponentsAlternating did not converge in $maxIter rounds; " +
        "raise maxIter or pass allowPartial")
    // stars: every edge is (member, root); roots label themselves
    val labels = edges.select(col("a").as("v"), col("b").as("lbl"))
      .unionByName(edges.select(col("b").as("v"), col("b").as("lbl")))
      .groupBy("v").agg(min(col("lbl")).as("lbl"))
    labels
  }

  /** EXACT token-set Jaccard self-join by PREFIX FILTERING (Bayardo et
    * al. AllPairs / Xiao et al. PPJoin): the published LOSSLESS
    * alternative to [[ngramJaccardPairs]]'s df-cap.
    *
    * Principle: order the vocabulary globally by (df asc, token) —
    * rarest first — and take each record's first |x| − ⌈t·|x|⌉ + 1
    * tokens under that order as its prefix. If J(x,y) ≥ t the two
    * prefixes MUST share a token (pigeonhole on the required overlap),
    * so the candidate join runs over prefix postings only: each record
    * contributes ~(1−t)·|x| postings, and they are its RAREST tokens,
    * exactly the ones with short posting lists. No recall is lost —
    * unlike dfCap, which trades bounded recall for linearity, prefix
    * filtering prunes with a proof.
    *
    * Plan: one vocab aggregate, a broadcast rank join (a vocab is
    * megabytes at any corpus scale — same argument as tfidf), one
    * per-record window for the prefix cut (partitioned by id, scan
    * local), the prefix-postings self-join, then an array_intersect
    * verify on the candidate pairs only. The candidate volume still
    * depends on the df of rare tokens — a degenerate corpus whose
    * rarest tokens are hot (tiny vocab) degrades toward the full
    * inverted index, with correctness intact.
    *
    * Returns (i, j, jaccard) with i < j, J ≥ threshold, exact. */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8): DataFrame =
    prefixJaccardShared(df, idCol, textCol, threshold).pairs

  /** [[prefixJaccardPairs]] plus the PERSISTED per-document set table it
    * verifies against: `docSets` is (id, tr) where `tr` is the document's
    * distinct-token set as xxhash64 surrogates (or raw token strings on
    * the astronomically-rare non-injective corpus — either way Jaccard
    * over `tr` EQUALS Jaccard over the token sets). Callers that need an
    * independent exactness probe (p80's losslessness gate) derive their
    * truth pairs from `docSets` instead of re-tokenizing the corpus: one
    * tokenization feeds the join AND its audit, and the probe measures
    * the same sets the verify stage used — so a probe miss can only mean
    * pruning dropped a pair, never a tokenization drift. */
  final case class PrefixJoin(pairs: DataFrame, docSets: DataFrame)

  def prefixJaccardShared(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double = 0.8): PrefixJoin = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // Both intermediates fan out: rp feeds the prefix cut AND the
    // rank-set verify table; pref feeds BOTH sides of the candidate
    // self-join. Un-persisted, each consumer replays tokenize + explode +
    // rank join + two id-windows — measured 21.6 s -> ~8 s at sf0.1 from
    // these two persists alone. Both tables are corpus-linear and skinny
    // (postings of longs); MEMORY_AND_DISK spills rather than OOMs.
    // posts feeds THREE consumers (the vocab aggregate, the prefix-cut
    // join, the verify set table) — persist the skinny (id, tok) frame
    // so tokenize + explode runs once. pref feeds both sides of the
    // candidate self-join — persisted for the same reason (un-persisted,
    // each consumer replays the id-windows; measured 21.6 s -> ~8 s at
    // sf0.1 in r7 from these persists). Corpus-linear and skinny;
    // MEMORY_AND_DISK spills rather than OOMs.
    val posts = tokenPostings(df, idCol, textCol)
      .transform(graft.operators.Broadcasts.trackedPersist)
    // ONE job materializes the vocab cache AND answers injectivity: the
    // aggregate is the materializing action, so the broadcast gate can
    // measure the populated cache without sizeGated's separate count
    // (r10 paid two vocab jobs here)
    val voc0 = graft.operators.Broadcasts.trackedPersist(vocabOf(posts))
    val injRow = voc0.agg(count(lit(1)).as("c"),
      countDistinct(col("h")).as("d")).head()
    val injective = injRow.getLong(0) == injRow.getLong(1)
    val voc = graft.operators.Broadcasts.gateMaterialized(voc0)
    // single consumer (the per-doc aggregate) — no persist: the join
    // streams out of the posts cache against the gated vocab
    val rp = posts.join(voc, "tok")
    // ONE per-doc aggregate feeds BOTH the prefix cut and the verify set
    // table (r10 ran two separate groupBys over the postings — same
    // shuffle twice). The sorted struct array is the prefix order AND
    // carries the set surrogates; downstream derivations (slice, field
    // projection) read its cache without reshuffling.
    val docAgg = graft.operators.Broadcasts.trackedPersist(
      rp.groupBy("id")
        .agg(array_sort(collect_list(struct(col("tdf"), col("tok"),
          col("h")))).as("ts")))
    // no persist on pref: both self-join sides re-derive it from the
    // docAgg cache with a scan-local slice+posexplode — no shuffle, and
    // skipping the cache write beats paying it for an 8k-row frame
    val pref = prefixSlice(docAgg, threshold)
    // LENGTH filter (the second PPJoin prune, equally lossless):
    // J(x,y) >= t forces t*|x| <= |y| <= |x|/t, so cross-length
    // candidates die INSIDE the join before any pair materializes
    // downstream - measured 13.4M -> 3.4M at t=0.95 on the bounded-
    // vocab corpus
    // join on the LONG token hash, not the token string: the probe
    // hashes the key once per posting pair, and long hashing beats
    // string hashing. An xxhash64 collision between distinct tokens can
    // only ADD candidate rows (a superset join); it cannot drop a true
    // pair (same token => same hash), and the verify below stays exact.
    val a = pref.select(col("h"), col("id").as("i"), col("n").as("ni"),
      col("pos").as("pa"))
    val b = pref.select(col("h"), col("id").as("j"), col("n").as("nj"),
      col("pos").as("pb"))
    // POSITIONAL filter (PPJoin's third lossless prune, Xiao et al. §3):
    // for a shared token at rank positions (pa, pb), common tokens ranked
    // below it number at most min(pa,pb)-1 (they precede it in BOTH
    // records) and those ranked at-or-above at most 1 + min(ni-pa, nj-pb),
    // so overlap(x,y) <= min(pa,pb) + min(ni-pa, nj-pb). J >= t forces
    // overlap >= ceil(t/(1+t)*(ni+nj)) =: alpha; the bound holds for
    // EVERY shared prefix token, so dropping candidate rows with
    // ubound < alpha loses no true pair (a true pair's every match row
    // satisfies ubound >= overlap >= alpha). The 1e-9 slack keeps a
    // float-exact alpha from rounding up and pruning a boundary pair.
    val alpha = ceil((col("ni") + col("nj")) * lit(threshold / (1.0 + threshold))
      - lit(1e-9))
    // the same 1e-9 slack on the length filter: t·n floats ABOVE the
    // exact integer product for many (n, t) pairs (100·0.55 =
    // 55.000000000000007), and this prune is lossless-by-proof only if
    // an exact-boundary pair (ni = t·nj) survives it
    val cands = a.join(b, "h")
      .filter(col("i") < col("j") &&
        col("ni") >= lit(threshold) * col("nj") - lit(1e-9) &&
        col("nj") >= lit(threshold) * col("ni") - lit(1e-9) &&
        (least(col("pa"), col("pb")) +
          least(col("ni") - col("pa"), col("nj") - col("pb"))) >= alpha)
      .select("i", "j").distinct()
    // Verify on HASH-array sets (longs, not token strings:
    // array_intersect hashes every element per pair, and integer
    // hashing is several times cheaper). The long ids must be a
    // BIJECTION of the vocabulary for |intersection| to be exact, so
    // the one bounded aggregate below CHECKS xxhash64 injectivity on
    // this corpus's cached vocabulary (collision odds ~ V²/2⁶⁴ ≈ 0.03
    // even at 10⁹ tokens) and falls back to token-string sets in the
    // astronomically-rare hit — exact by construction, never
    // exact-with-high-probability. Candidates are the big side
    // (quadratic on degenerate corpora - ScalingSpec) and should not be
    // shuffled twice just to fetch two tiny arrays - BUT the set table
    // is corpus-linear (one row per document), so the broadcast hint is
    // applied ONLY under Broadcasts.sizeGated's measured byte cap: an
    // explicit hint is honored regardless of autoBroadcastJoinThreshold
    // and would fail outright (8 GB limit / driver OOM) on a corpus
    // past the cap, where the gate instead emits no hint and the
    // planner shuffles.
    // derived from the docAgg cache (a field projection over the sorted
    // struct array — scan-local, no second groupBy over the postings);
    // the sizeGated count below doubles as docAgg's materializing action
    // The surrogate arrays SORT ONCE per document (longs, scan-local)
    // so the per-candidate intersection is an allocation-free linear
    // merge inside codegen (graft_sorted_intersect_count) instead of
    // array_intersect's per-pair hash set + materialized output array —
    // the same swap Graphs.triangleStats measured 5.0 → 3.1 s at sf0.1.
    // Sorting changes only element ORDER: |∩|, the set sizes, and every
    // downstream Jaccard are unchanged (PrefixJoinSpec pins equality).
    // The astronomically-rare non-injective fallback keeps token-string
    // sets and the hash-based intersect (the kernel is long-typed).
    val setExpr = if (injective)
                    array_sort(transform(col("ts"), t => t.getField("h")))
                  else transform(col("ts"), t => t.getField("tok"))
    val rankSets = graft.operators.Broadcasts.sizeGated(
      docAgg.select(col("id"), setExpr.as("tr")))
    graft.functions.VectorExprs.register(df.sparkSession)
    val interExpr =
      if (injective) expr("graft_sorted_intersect_count(ta, tb)")
      else size(array_intersect(col("ta"), col("tb"))).cast("long")
    val pairs = cands
      .join(rankSets.select(col("id").as("i"), col("tr").as("ta")), "i")
      .join(rankSets.select(col("id").as("j"), col("tr").as("tb")), "j")
      .withColumn("inter", interExpr)
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("ta")) + size(col("tb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
    PrefixJoin(pairs, rankSets)
  }

  /** Distinct (id, tok, tdf, h) postings: each document's distinct
    * tokens joined with their corpus document frequency `tdf` and
    * 64-bit token hash `h`. The PPJoin machinery needs the vocabulary
    * ORDERED rarest-first — which (tdf, tok) provides directly as a
    * sort key — and a cheap join/verify surrogate for the token —
    * which `xxhash64(tok)` provides. r8 materialized that order as a
    * DENSE global row_number (a distributed range-partitioned sort of
    * the whole vocabulary); r9 removes the sort entirely: no PPJoin
    * stage needs rank VALUES, only the order and a bijection, so the
    * vocab aggregate goes straight to the size-gated join (a vocabulary
    * obeys Heaps' law — 10^8-10^9 tokens at web scale, past any
    * unconditional broadcast). Hash collisions cannot lose a pair (the
    * candidate join becomes a superset) and the verify checks
    * injectivity before trusting hash sets (see prefixJaccardPairs). */
  private def tokenPostings(df: DataFrame, idCol: String,
                            textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("id"), explode(col("ts")).as("tok"))

  private def vocabOf(posts: DataFrame): DataFrame =
    posts.groupBy("tok").agg(count(lit(1)).as("tdf"))
      .withColumn("h", xxhash64(col("tok")))

  private[pipeline] def rankedPostings(df: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val posts = tokenPostings(df, idCol, textCol)
    posts.join(graft.operators.Broadcasts.sizeGated(vocabOf(posts)), "tok")
  }

  /** Keep each record's first |x| - ceil(t*|x|) + 1 rarest-first tokens
    * (global order = (tdf asc, tok asc) — the order IS the sort key, no
    * materialized rank needed), with each kept token's position `pos`
    * (1-based) and the record set size `n` — `pos` feeds the positional
    * filter. */
  private def prefixCut(rp: DataFrame, threshold: Double): DataFrame =
    // ONE shuffle: per-doc sorted token array (record sets are bounded —
    // documents have bounded distinct tokens — so the array state is
    // small), then explode ONLY the prefix slice. r8 paid two full
    // windows over every posting (shuffle + per-id sort of the whole
    // posting stream, then a filter that threw 95% of it away); the
    // aggregate emits |prefix| rows per doc directly.
    prefixSlice(rp.groupBy("id")
      .agg(array_sort(collect_list(struct(col("tdf"), col("tok"), col("h"))))
        .as("ts")), threshold)

  /** The explode-only half of [[prefixCut]]: from the per-doc sorted
    * (tdf, tok, h) array, emit each record's prefix tokens with position
    * and set size. Split out so [[prefixJaccardShared]] can feed it the
    * SAME persisted per-doc aggregate that the verify set table derives
    * from — slice and posexplode are scan-local on the cache. */
  private def prefixSlice(docAgg: DataFrame, threshold: Double): DataFrame = {
    docAgg
      .withColumn("n", size(col("ts")))
      // 1e-9 slack: n·t floats above the exact integer product for many
      // (n, t) pairs (100·0.55 → ceil 56, not 55), which would shorten
      // the prefix by one token and silently lose boundary true pairs —
      // the same guard alpha already carries. Slack only ever LENGTHENS
      // the prefix, adding candidates the exact verify then rejects.
      .withColumn("plen",
        (col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + 1).cast("int"))
      .select(col("id"), col("n"),
        posexplode(slice(col("ts"), lit(1), col("plen"))).as(Seq("p0", "t")))
      .select(col("t.tok").as("tok"), col("t.h").as("h"), col("id"),
        col("n"), (col("p0") + 1).as("pos"))
  }

  /** Prefix-postings candidate volume vs the full inverted index - the
    * measurable pruning claim behind [[prefixJaccardPairs]]. */
  private[pipeline] def prefixPostings(df: DataFrame, idCol: String,
                                       textCol: String,
                                       threshold: Double): DataFrame =
    prefixCut(rankedPostings(df, idCol, textCol), threshold)
}
