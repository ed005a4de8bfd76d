package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking-based entity resolution (record linkage).
  *
  * Beyond-reference operator: merging near-identical records (vendor
  * catalogs, crawled product names, user profiles) is the classic
  * record-linkage problem, and the only shape that survives 100 TB is
  * BLOCKING — candidates are generated ONLY inside an equi-joinable
  * block key, never via a similarity theta join (Fellegi–Sunter 1969;
  * same discipline as the MinHash/LSH band joins in [[Dedup]]).
  */
object EntityRes {

  /** Candidate pairs by blocking key + edit-distance verify.
    *
    * Stage 1 (blocking): each record maps to ONE deterministic block key
    * — scan-local expressions only. Stage 2 (hot-block cap): block sizes
    * are counted with one skinny aggregate and blocks above `blockCap`
    * are dropped LOUDLY into the returned accounting rather than joined
    * — a degenerate key (empty names, a boilerplate token) would
    * otherwise quadratically explode, the exact failure mode dfCap
    * guards in [[Dedup.ngramJaccardPairs]]. Stage 3 (verify): the
    * block-keyed self-equi-join (a shuffle hash join on the key, never a
    * cartesian) emits ordered pairs id_a < id_b and keeps those with
    * levenshtein ≤ maxEdits.
    *
    * Cost at scale: pairs only materialize within blocks, Σ|block|² with
    * |block| ≤ blockCap — linear in records for bounded block sizes, and
    * the cap converts adversarial keys into an explicit coverage note.
    *
    * Returns (id_a, id_b, block_key, edits). */
  def blockedPairs(records: DataFrame, idCol: String, nameCol: String,
                   blockKey: Column, maxEdits: Int = 3,
                   blockCap: Int = 1000): DataFrame = {
    val keyed = records.select(col(idCol).as("id"), col(nameCol).as("nm"),
      blockKey.as("bk"))
    // The block-size table is one row per DISTINCT BLOCK KEY — unbounded
    // in the corpus (names, prefixes, phonetic codes all grow with it) —
    // so the broadcast hint is size-gated: under the measured cap it
    // broadcasts, past it no hint is emitted and the planner shuffles.
    val sizes = graft.operators.Broadcasts.sizeGated(
      keyed.groupBy("bk").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= blockCap).select("bk"))
    val kept = keyed.join(sizes, "bk")
    val a = kept.select(col("bk"), col("id").as("id_a"), col("nm").as("nm_a"))
    val b = kept.select(col("bk"), col("id").as("id_b"), col("nm").as("nm_b"))
    a.join(b, "bk")
      .filter(col("id_a") < col("id_b"))
      // Banded levenshtein: the threshold form abandons a pair as soon as
      // the edit distance provably exceeds maxEdits (returns -1), turning
      // O(|a|*|b|) full DP into O(maxEdits * min(|a|,|b|)) per pair — the
      // verify is the hot loop, pairs * len^2 vs pairs * k*len at scale.
      .withColumn("edits", levenshtein(col("nm_a"), col("nm_b"), maxEdits))
      .filter(col("edits") >= 0 && col("edits") <= maxEdits)
      .select(col("id_a"), col("id_b"), col("bk").as("block_key"),
        col("edits").cast("long").as("edits"))
  }

  /** Dropped-block accounting for [[blockedPairs]] — how many blocks and
    * records the cap excluded (the "silent caps" discipline: bounded
    * coverage must be visible in the output, not a comment). */
  def blockCapAccount(records: DataFrame, idCol: String,
                      blockKey: Column, blockCap: Int = 1000): DataFrame = {
    records.select(col(idCol).as("id"), blockKey.as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("bn"))
      .agg(count(lit(1)).as("n_blocks"),
        max(col("bn")).as("max_block"),
        sum(when(col("bn") > blockCap, lit(1)).otherwise(lit(0L)))
          .as("n_blocks_dropped"),
        sum(when(col("bn") > blockCap, col("bn")).otherwise(lit(0L)))
          .as("n_records_dropped"))
  }
}
