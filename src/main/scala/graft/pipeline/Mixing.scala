package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training-data pipelines: reproducible
  * splits, stratified source mixing, and token-budget sequence packing.
  *
  * Everything here is a deterministic function of the row's id — no
  * `rand()`. A rand()-based split changes under task retry, partition
  * count, or cluster size; a hash split never does, which is the property
  * that makes a 100 TB train/val/test assignment auditable months later.
  * The hash is engine-portable (md5 of a salted decimal id string), so
  * any SQL engine can re-derive exactly who was sampled.
  */
object Mixing {

  /** Deterministic U[0,1) from an id: the first 8 hex chars of
    * md5("salt:id"), scaled. Quantized to multiples of 2^-32; the salt
    * decorrelates independent decisions (split vs mix) on the same id. */
  def hashUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Deterministic per-epoch corpus SHUFFLE — the curation pipeline's
    * final step (clean → dedup → mix → pack → shuffle): epoch e orders
    * the corpus by the salted unit hash of (id, e), a fresh
    * pseudo-random permutation per epoch that any engine and any task
    * retry reproduces exactly — no rand(), no shuffle-service state.
    * The hash is uniform on [0,1), so `shard = floor(k·S)` IS range
    * partitioning on the sort key: one exchange moves every row to its
    * shard, a partition-local sort orders it, and a reader streaming
    * shards 0..S-1 sees the full permutation — the terasort shape io07
    * proves at the layout level. Appends (epoch, k, shard); land it
    * `partitionBy(epoch, shard).sortWithinPartitions(k)`. Ties in the
    * 32-bit hash are broken by id downstream (order by (k, id)). */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int, shards: Int,
                   salt: String = "eshuf"): DataFrame = {
    require(epochs >= 1 && shards >= 1,
      s"need epochs/shards >= 1, got $epochs/$shards")
    df.withColumn("epoch", explode(array((0 until epochs).map(lit): _*)))
      .withColumn("k", hashUnit(concat(col(idCol).cast("string"),
        lit("#"), col("epoch").cast("string")), salt))
      .withColumn("shard", floor(col("k") * shards).cast("long"))
  }

  /** Train/val/test assignment from a unit hash. */
  def splitAssign(u: Column, trainFrac: Double = 0.8, valFrac: Double = 0.1): Column =
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")

  /** Stratified keep-decision: keep the row when its (salted) unit hash
    * clears the per-stratum rate — downsampling sources to a target mix
    * without a shuffle (scan-local, exactly reproducible). */
  def stratifiedKeep(u: Column, rate: Column): Column = u < rate

  /** TEMPERATURE-WEIGHTED source mixing (the multilingual/multi-source
    * sampling scheme of Lample & Conneau 2019 §3.1, used to rebalance
    * training mixtures): source s gets mixture weight
    * w_s = n_s^τ / Σ_t n_t^τ, and to realize a corpus of `targetFrac`·N
    * documents each source keeps rate_s = min(1, targetFrac·N·w_s / n_s).
    * τ < 1 UPSAMPLES small sources relative to their natural share
    * (τ = 1 is proportional sampling, τ = 0 equalizes sources). The rate
    * table is one tiny aggregate (|sources| rows — window functions over
    * it are driver-trivial) broadcast back onto the corpus, where the
    * keep decision is the same deterministic hashUnit test as
    * stratifiedKeep — scan-local, reproducible, engine-portable.
    * Input: (srcCol, nCol) per-source counts. Output: + (weight, rate). */
  def temperatureRates(counts: DataFrame, srcCol: String, nCol: String,
                       tau: Double, targetFrac: Double): DataFrame = {
    val all = Window.partitionBy(lit(0)) // bounded |sources|-row frame
    counts
      .withColumn("w", pow(col(nCol).cast("double"), tau) /
        sum(pow(col(nCol).cast("double"), tau)).over(all))
      .withColumn("rate", least(lit(1.0),
        lit(targetFrac) * sum(col(nCol)).over(all).cast("double") *
          col("w") / col(nCol).cast("double")))
  }

  /** UniMax sampling allocation [Chung et al. 2023]: distribute a total
    * `budget` (chars/tokens) over sources with a hard per-source repeat
    * cap — fairer than temperature sampling because no tiny source is
    * ever repeated past `epochCap` epochs to satisfy a power law. The
    * greedy water-filling ("ascending caps; each source takes
    * min(cap, remaining/left)") has a CLOSED FORM once sources are
    * sorted by capacity: the capped set is exactly the prefix where
    * cap_i·(m−i+1) ≤ budget − prefix_{i−1} — with ascending caps, once
    * a source is uncapped every later one is too — so the whole
    * allocation is ONE sort + two windows over the |sources|-row
    * aggregate, no iteration, engine-portable. Uncapped sources split
    * the leftover equally. Emits (src, n, cap, capped, alloc, epochs);
    * Σ alloc = min(budget, Σ cap) by construction. */
  def uniMaxAllocation(counts: DataFrame, srcCol: String, nCol: String,
                       budget: Double, epochCap: Double): DataFrame = {
    // lit partition key on the audited |sources|-row windows: same
    // bounded single-partition plan, no WindowExec warning noise
    val byCap = Window.partitionBy(lit(0)).orderBy(col("cap"), col(srcCol))
    val all = Window.partitionBy(lit(0))
    counts
      .withColumn("cap", col(nCol).cast("double") * epochCap)
      .withColumn("i", row_number().over(byCap))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("pfx", coalesce(
        sum(col("cap")).over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0.0)))
      .withColumn("capped",
        col("cap") * (col("m") - col("i") + 1) <= lit(budget) - col("pfx"))
      .withColumn("cappedMass",
        coalesce(sum(when(col("capped"), col("cap"))).over(all), lit(0.0)))
      .withColumn("nCapped",
        coalesce(sum(when(col("capped"), 1L)).over(all), lit(0L)))
      .withColumn("alloc", when(col("capped"), col("cap")).otherwise(
        (lit(budget) - col("cappedMass")) / (col("m") - col("nCapped"))))
      .withColumn("epochs", col("alloc") / col(nCol).cast("double"))
      .select(col(srcCol), col(nCol), col("cap"), col("capped"),
        col("alloc"), col("epochs"))
  }

  /** Token-budget sequence packing (offset binning): docs are laid out in
    * a deterministic order per source and cut into `budget`-token
    * sequences; a doc belongs to the bin its FIRST token lands in. One
    * window pass per source — the same single-shuffle shape as
    * sessionization, and the partition key (source/shard) bounds skew.
    * Emits (source, doc order cols…, toks, cum, bin). */
  def packBins(df: DataFrame, sourceCol: String, orderCol: String,
               toksCol: String, budget: Int): DataFrame = {
    require(budget >= 1, s"budget >= 1, got $budget")
    val w = Window.partitionBy(sourceCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(toksCol)).over(w))
      .withColumn("bin",
        floor((col("cum") - col(toksCol)) / budget.toDouble).cast("long"))
  }

  /** Per-domain char-budget cap (greedy knapsack per source): docs are
    * ranked inside each source by descending quality proxy (here:
    * length, id tie-break) and kept while the running char total stays
    * inside `budget` — the "no single domain dominates the mixture"
    * guard every web-corpus recipe applies (C4 caps per-URL, RefinedWeb
    * per-domain). The cumulative sum is monotone, so `cum <= budget`
    * keeps an exact prefix of each source's ranking.
    *
    * Shape: ONE window shuffle keyed by source (the same
    * single-shuffle-per-source shape as [[packBins]]); the partition key
    * bounds skew because a source's docs land on one reducer only for
    * ranking, never for the full corpus. All-integer arithmetic — no fp
    * in the keep decision, so any engine re-derives the identical cut.
    * Emits the input columns + (cum_chars, kept). */
  def charBudgetCap(df: DataFrame, sourceCol: String, charsCol: String,
                    idCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(sourceCol)
      .orderBy(col(charsCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_chars", sum(col(charsCol)).over(w))
      .withColumn("kept", col("cum_chars") <= budget)
  }

  /** DSIR importance weights [Xie et al. 2023]: score every document by
    * how target-like its hashed n-gram profile is,
    * log w(doc) = Σ_f [ln p_target(bucket(f)) − ln p_raw(bucket(f))],
    * with Laplace-smoothed bag-of-buckets multinomials over `buckets`
    * hashed unigram+bigram features (the paper's hashed-ngram feature
    * space). High-weight docs are the ones importance RESAMPLING keeps
    * when fitting raw data to a target distribution (e.g. books/wiki).
    *
    * Shape: one feature explode (scan-local; the bucket hash is the
    * engine-portable md5 arithmetic of [[hashUnit]], so any SQL engine
    * re-derives identical buckets), ONE conditional-count aggregate over
    * the B-bounded bucket space for both models at once, a window over
    * those ≤B rows for the totals, then the log-ratio table — kilobytes
    * at any corpus size — broadcast back over the feature stream for one
    * per-doc rollup. No stage depends on corpus breadth beyond the two
    * skinny shuffles. Tokens and bigrams can't collide as features
    * (bigrams contain a space; tokens never do).
    * Returns (id, n_feats, log_w rounded to 1e-6). */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     isTarget: Column, buckets: Int = 1024): DataFrame = {
    val base = docs.select(col(idCol).as("id"), isTarget.as("is_target"),
      TextOps.tokens(col(textCol)).as("t"))
    val bigrams = zip_with(col("t"),
      slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val feats = base
      .select(col("id"), col("is_target"),
        explode(concat(col("t"), bigrams)).as("f"))
      // drop the empty string too: splitting an empty/whitespace-only
      // document yields [""], which would otherwise count as a real
      // feature — giving empty docs n_feats = 1 and inflating one
      // bucket's c_r across the whole model
      .filter(col("f").isNotNull && col("f") =!= "")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)))
    val b = lit(buckets.toDouble)
    val model = feats.groupBy("bucket").agg(
        count(lit(1)).as("c_r"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
      .withColumn("n_r", sum(col("c_r")).over(Window.partitionBy(lit(0))))
      .withColumn("n_t", sum(col("c_t")).over(Window.partitionBy(lit(0))))
      .withColumn("lr",
        log((col("c_t") + lit(1.0)) / (col("n_t") + b)) -
          log((col("c_r") + lit(1.0)) / (col("n_r") + b)))
    feats.join(broadcast(model.select("bucket", "lr")), "bucket")
      .groupBy("id").agg(
        count(lit(1)).as("n_feats"),
        round(sum(col("lr")), 6).as("log_w"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the placement
    * function whose defining property is MINIMAL MOVEMENT: growing n→n+1
    * shards relocates only the keys whose new shard wins, an expected
    * 1/(n+1) of them, where mod-hashing reshuffles nearly everything.
    * Scan-local (n weight hashes + one array-max per row, ZERO
    * shuffle) — placement must never cost a repartition of the data it
    * places. Ties (astronomically rare with 32-bit weights, but the
    * contract must be total) break toward the SMALLEST shard id: the
    * max is taken over (weight, −shard) structs, matching an
    * `ORDER BY weight DESC, shard ASC` oracle.
    *
    * Built as `array_max` over an n-element struct array, NOT a
    * when/otherwise fold — a fold that references the running best on
    * both branches doubles the expression tree per shard (O(2^n) nodes:
    * nShards=24 already OOMs the driver during plan construction, and a
    * routine 64-shard placement never finishes analyzing). */
  def rendezvousShard(id: Column, nShards: Int, salt: String): Column = {
    require(nShards >= 1, s"nShards >= 1, got $nShards")
    val scored = array((0 until nShards).map(s0 => struct(
      hashUnit(id, s"$salt:$s0").as("w"),
      lit(-s0).cast("long").as("neg_shard"))): _*)
    -array_max(scored).getField("neg_shard")
  }

  /** Concatenate-and-chunk sequence packing with BOUNDARY accounting —
    * the GPT-style pretraining layout: each source's documents
    * concatenate in deterministic id order into one token stream, cut
    * into fixed `budget`-token windows; a document starting mid-window
    * is where the attention mask resets, so the training loader needs
    * per-window boundary facts, not just [[packBins]]'s bin ids.
    *
    * Per (source, window): how many documents START here (n_starts),
    * their first/last in-window offsets (the mask-reset positions), and
    * how many documents FLOW IN from earlier windows (n_enters — a doc
    * longer than the budget crosses several). Integer arithmetic end to
    * end, so any engine re-derives the identical layout.
    *
    * Shape: ONE window shuffle keyed by source for the exclusive cumsum
    * (the packBins shape), then a bounded explode — a doc emits one row
    * per window it ENTERS, Σ ≈ stream_tokens/budget rows, corpus-linear
    * — and two skinny (source, bin) aggregates joined full-outer (a
    * window can have entries and no starts, or vice versa).
    * Returns (source, bin, n_starts, n_enters, first_off, last_off). */
  def packWindows(df: DataFrame, sourceCol: String, idCol: String,
                  toksCol: String, budget: Int): DataFrame = {
    require(budget >= 1, s"budget >= 1, got $budget")
    val w = Window.partitionBy("src").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = df.select(col(sourceCol).as("src"), col(idCol).as("id"),
        col(toksCol).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .withColumn("cum_b", sum(col("toks")).over(w) - col("toks"))
      .withColumn("start_bin", floor(col("cum_b") / budget))
      .withColumn("end_bin",
        floor((col("cum_b") + col("toks") - 1) / budget))
    val starts = spans.groupBy(col("src"), col("start_bin").as("bin"))
      .agg(count(lit(1)).as("n_starts"),
        min(col("cum_b") - col("start_bin") * budget).as("first_off"),
        max(col("cum_b") - col("start_bin") * budget).as("last_off"))
    val enters = spans.filter(col("end_bin") > col("start_bin"))
      .select(col("src"),
        explode(sequence(col("start_bin") + 1, col("end_bin"))).as("bin"))
      .groupBy("src", "bin").agg(count(lit(1)).as("n_enters"))
    starts.join(enters, Seq("src", "bin"), "full_outer")
      .select(col("src").as("source"), col("bin").cast("long").as("bin"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"),
        coalesce(col("n_enters"), lit(0L)).as("n_enters"),
        col("first_off").cast("long").as("first_off"),
        col("last_off").cast("long").as("last_off"))
  }

  /** EXACT-proportion stratified split: the hash split ([[splitAssign]])
    * realizes its fractions only in expectation — fine where strata are
    * huge, but a small stratum (a rare language, a niche source) can
    * land 70/30 instead of 80/10/10, and eval sets on small strata are
    * exactly where that hurts. This variant ranks each stratum's rows by
    * the SAME salted unit hash (so membership stays a deterministic,
    * auditable function of the id) and cuts at exact per-stratum counts:
    * rank ≤ ⌊n·trainFrac⌋ → train, ≤ ⌊n·(trainFrac+valFrac)⌋ → val,
    * remainder → test (floors + remainder-to-test make the three counts
    * total n with zero ambiguity; 1e-9 guards an exact-product floor).
    *
    * Cost: ONE window per stratum (rank + count over the stratum
    * partition) — one shuffle keyed by stratum. A stratum that outgrows
    * a sort partition at 100 TB swaps in approx_percentile cutoffs on u
    * broadcast into a scan-local compare (the perplexityBuckets note);
    * the rank form is kept because exactness is this operator's point.
    * Returns (id, stratum, u_r, split). */
  def exactStratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
                           salt: String, trainFrac: Double = 0.8,
                           valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"need 0 < trainFrac, 0 <= valFrac, trainFrac+valFrac < 1")
    val u = hashUnit(col(idCol), salt)
    val w = Window.partitionBy("stratum").orderBy(col("u_r"), col("id"))
    df.select(col(idCol).as("id"), col(stratumCol).as("stratum"),
        round(u, 8).as("u_r"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("stratum")))
      .withColumn("split",
        when(col("rk") <= floor(col("n") * lit(trainFrac) + lit(1e-9)), "train")
          .when(col("rk") <= floor(col("n") * lit(trainFrac + valFrac)
            + lit(1e-9)), "val")
          .otherwise("test"))
      .select("id", "stratum", "u_r", "split")
  }

  /** Weighted sampling WITHOUT replacement, exact top-k (Efraimidis &
    * Spirakis 2006 A-Res): each row draws key = u^(1/w) from its salted
    * unit hash and the k largest keys ARE a weighted sample without
    * replacement — the one-pass, shuffle-light replacement for the
    * sequential weighted urn, and deterministic here because u is a hash,
    * not rand() (re-runs, retries, and other engines reproduce the same
    * sample). ORDER BY + LIMIT compiles to TakeOrderedAndProject:
    * per-partition partial top-k, no global sort materializes — the
    * correct 100 TB shape for "give me k representative docs, long ones
    * more likely". Keys are rounded to 1e-8 BEFORE ranking with an id
    * tie-break (the engine-portable ranking discipline used repo-wide).
    * Non-positive (and NULL) weights cannot be sampled — u^(1/w) is not
    * a valid race key there — and are EXCLUDED deterministically, the
    * A-Res definition of zero selection probability; an unexpectedly
    * small sample is the caller's signal to audit the weight column.
    * Returns (rk 1..k, id, weight, key_r). */
  def weightedSampleK(df: DataFrame, idCol: String, weightCol: String,
                      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    val keyed = df.select(col(idCol).as("id"),
        col(weightCol).cast("double").as("weight"))
      // !isnan is load-bearing: Spark orders NaN ABOVE every double, so
      // a NaN weight passes `> 0`, yields key_r = NaN, and monopolizes
      // the descending top-k (the Stats/ZOrder NaN-guard convention)
      .filter(col("weight") > 0 && !isnan(col("weight")))
      .withColumn("key_r",
        round(pow(hashUnit(col("id"), salt), lit(1.0) / col("weight")), 8))
    val w = Window.partitionBy(lit(0)).orderBy(col("key_r").desc, col("id"))
    // global LIMIT k after ORDER BY -> TakeOrderedAndProject (partial
    // top-k below the exchange); the row_number re-rank runs on k rows
    keyed.orderBy(col("key_r").desc, col("id")).limit(k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select("rk", "id", "weight", "key_r")
  }
}
