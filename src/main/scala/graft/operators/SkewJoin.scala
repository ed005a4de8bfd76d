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

  /** One mergeable measure of [[saltedAgg]]: `kind` ∈ count|sum|min|max,
    * `col` the measured column (ignored for count), `as` the output name. */
  final case class Measure(kind: String, col: String, as: String)

  /** Two-phase SALTED aggregation — the groupBy complement of [[salted]]
    * for extreme key skew. Spark's hash aggregate already computes
    * map-side partials, but every partial for one key still merges on ONE
    * reducer; when a single key owns a double-digit share of a 100 TB
    * table (the `event_type` shape), that reducer is the stage. Salting
    * the grouping key spreads the merge over `salts` reducers, and a
    * second (tiny: keys × salts rows) aggregate folds the partials. Only
    * the mergeable algebra is offered — count/sum/min/max compose across
    * salts by construction; a non-decomposable measure (exact distinct,
    * median) would silently change meaning here and must go through the
    * sketch aggregates instead. The salt is a hash of a per-row id: which
    * salt a row gets never affects the result, only the spread. */
  def saltedAgg(df: DataFrame, keys: Seq[String], measures: Seq[Measure],
                salts: Int = 32): DataFrame = {
    require(salts > 0, "salts must be positive")
    val kinds = Set("count", "sum", "min", "max")
    require(measures.nonEmpty && measures.forall(m => kinds(m.kind)),
      s"measures must be of kinds $kinds")
    require(measures.map(_.as).distinct.size == measures.size,
      "duplicate output names")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(measures.head match {
        case Measure("count", _, as) => count(lit(1)).as(as)
        case Measure(k, c, as) => expr(s"$k($c)").as(as)
      }, measures.tail.map {
        case Measure("count", _, as) => count(lit(1)).as(as)
        case Measure(k, c, as) => expr(s"$k($c)").as(as)
      }: _*)
    val merged = measures.map {
      case Measure("count", _, as) => sum(col(as)).as(as)
      case Measure("sum", _, as) => sum(col(as)).as(as)
      case Measure("min", _, as) => min(col(as)).as(as)
      case Measure("max", _, as) => max(col(as)).as(as)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(merged.head, merged.tail: _*)
  }
}
