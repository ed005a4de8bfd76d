package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual remedy for join skew when a hot key
  * overwhelms single reducers and neither broadcast (dim too big) nor
  * AQE's skew-split (which only kicks in for sort-merge joins above
  * size thresholds, and cannot split a single hot KEY's hash bucket
  * for aggregating joins) applies.
  *
  * Every fact row gets a pseudo-random salt in [0, salts); the dim side
  * replicates each row across ALL salts; the join key becomes
  * (key, salt), spreading one hot key over `salts` reducers. Cost:
  * dim inflates ×salts — use for skewed fact ⋈ modest dim joins.
  * Semantics are exactly those of the unsalted join for inner/left:
  * each fact row carries one salt and the dim side covers every salt,
  * so matches and null-extension are per-fact-row unchanged.
  */
object SkewJoin {

  def salted(fact: DataFrame, dim: DataFrame, key: String,
             salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      "salting preserves semantics for inner/left joins of a salted fact side only")
    // salt is a hash of a per-row id: which salt a row gets is irrelevant
    // to the result (any value meets the replicated dim), only the spread
    // matters — so partition-layout dependence is harmless
    val f = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
