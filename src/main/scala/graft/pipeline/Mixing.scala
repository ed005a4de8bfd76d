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
    val all = Window.partitionBy()
    counts
      .withColumn("w", pow(col(nCol).cast("double"), tau) /
        sum(pow(col(nCol).cast("double"), tau)).over(all))
      .withColumn("rate", least(lit(1.0),
        lit(targetFrac) * sum(col(nCol)).over(all).cast("double") *
          col("w") / col(nCol).cast("double")))
  }

  /** Token-budget sequence packing (offset binning): docs are laid out in
    * a deterministic order per source and cut into `budget`-token
    * sequences; a doc belongs to the bin its FIRST token lands in. One
    * window pass per source — the same single-shuffle shape as
    * sessionization, and the partition key (source/shard) bounds skew.
    * Emits (source, doc order cols…, toks, cum, bin). */
  def packBins(df: DataFrame, sourceCol: String, orderCol: String,
               toksCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(sourceCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col(toksCol)).over(w))
      .withColumn("bin",
        floor((col("cum") - col(toksCol)) / budget.toDouble).cast("long"))
  }
}
