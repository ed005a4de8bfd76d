package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.storage.StorageLevel

/** Size-gated broadcast hints.
  *
  * An explicit `broadcast()` hint is an ORDER, not a suggestion: Spark
  * honors it regardless of `spark.sql.autoBroadcastJoinThreshold`, and a
  * build side past the hard 8 GB broadcast limit (or past driver memory)
  * fails the job outright instead of degrading to a shuffle join. That
  * makes an unconditional hint on any corpus-linear table (one row per
  * document, per block key, ...) a scale bug: correct at sf0.1, fatal at
  * 100 TB.
  *
  * [[Broadcasts.sizeGated]] measures before hinting: it persists the
  * frame (the callers all consume it at least twice, so the persist pays
  * for itself), materializes it, reads the ACTUAL cached size from the
  * InMemoryRelation stats, and applies the hint only under a byte cap.
  * Past the cap it emits NO hint and the planner — cost-based plus AQE's
  * runtime re-plan — picks the join strategy from real sizes.
  */
object Broadcasts {

  /** Conf key for the hint cap; tests set it to 0 to force the shuffle
    * path on toy data. */
  val MaxBytesConf = "graft.broadcast.maxBytes"

  /** Default hint cap: 512 MB — far under the 8 GB broadcast hard limit
    * and a safe fraction of any realistic driver heap, while still
    * covering every genuinely-small dimension this library hints. */
  val DefaultMaxBytes: Long = 512L << 20

  /** Persist + materialize `df`, then return it WITH a broadcast hint iff
    * its measured in-memory size is within the configured cap, else
    * without any hint. Always returns the persisted frame — callers that
    * reuse it (both sides of a self-join, a verify stage) read the cache
    * instead of recomputing the aggregate that produced it.
    *
    * The measurement is real, not estimated: after `count()` the cache
    * manager substitutes an InMemoryRelation whose stats carry the
    * accumulated batch bytes, so `optimizedPlan.stats.sizeInBytes` is the
    * observed cached footprint (an upper-bound proxy for the broadcast
    * build size, which is what we want for a safety gate). */
  def sizeGated(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cap = spark.conf.getOption(MaxBytesConf).map(_.toLong)
      .getOrElse(DefaultMaxBytes)
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count()
    val bytes = measuredBytes(cached)
    if (bytes <= cap) broadcast(cached) else cached
  }

  /** Observed cached size of a persisted-and-materialized frame. */
  private[graft] def measuredBytes(cached: DataFrame): BigInt =
    // A fresh Dataset over the same plan (identity filter) so cache
    // substitution — which happens when THIS query execution is optimized,
    // i.e. strictly after the persist+count above — sees the materialized
    // entry and reports its accumulated batch bytes. Planned, never run.
    cached.filter(org.apache.spark.sql.functions.lit(true))
      .queryExecution.optimizedPlan.stats.sizeInBytes
}
