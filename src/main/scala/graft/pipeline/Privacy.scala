package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over tabular corpora.
  *
  * Beyond-reference operator: the reference anonymizes SQL *identifiers*
  * (SURVEY.md §2.10); releasing the DATA itself needs the complementary
  * audit — how re-identifiable are rows under a set of quasi-identifiers,
  * and how much does each generalization step buy? That is the classic
  * k-anonymity / l-diversity sweep (Sweeney 2002; Machanavajjhala 2007),
  * and on 100 TB it is exactly one aggregation per generalization level
  * over skinny (QI..., sensitive) projections — no joins, no per-row
  * state, trivially map-side-combinable.
  */
object Privacy {

  /** One generalization level: a name plus the QI grouping columns. */
  final case class GenLevel(name: String, qi: Seq[Column])

  /** k-anonymity / l-diversity ladder audit.
    *
    * For each generalization level (finest → coarsest), groups rows into
    * equivalence classes by that level's quasi-identifier tuple and
    * reports: class count, rows in classes smaller than k (the
    * re-identifiable mass), the smallest class, and the minimum
    * l-diversity (distinct sensitive values in a class — a class can be
    * size ≥ k yet leak its sensitive attribute if every member shares
    * one value).
    *
    * Two aggregates per level: rows → classes (count + count distinct
    * sensitive), then classes → one summary row. Both shuffle skinny
    * tuples keyed by the QI; the second input is one row per CLASS, not
    * per row, so each coarser level shrinks. Levels are independent
    * passes unioned at the end — at scale you run them as one job and
    * Spark shares the scan.
    *
    * Returns one row per level:
    * (level, n_rows, n_classes, min_class, rows_unsafe, pct_unsafe,
    *  min_l_div, safe_k_anonymous, safe_l_diverse).
    */
  def kAnonymityLadder(df: DataFrame, levels: Seq[GenLevel],
                       sensitive: Column, k: Int = 5,
                       l: Int = 2): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    require(k >= 2 && l >= 1, s"k>=2 and l>=1, got k=$k l=$l")
    levels.map { lev =>
      val classes = df
        .groupBy(lev.qi.zipWithIndex.map { case (c, i) => c.as(s"qi_$i") }: _*)
        .agg(count(lit(1)).as("n"),
          countDistinct(sensitive).as("l_div"))
      classes.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("n")).as("min_class"),
        sum(when(col("n") < k, col("n")).otherwise(lit(0L))).as("rows_unsafe"),
        min(col("l_div")).as("min_l_div"))
        .select(
          lit(lev.name).as("level"),
          col("n_rows"), col("n_classes"), col("min_class"),
          col("rows_unsafe"),
          round(col("rows_unsafe").cast("double") / col("n_rows"), 6)
            .as("pct_unsafe"),
          col("min_l_div"),
          (col("min_class") >= k).as("safe_k_anonymous"),
          (col("min_l_div") >= l).as("safe_l_diverse"))
    }.reduce(_ unionAll _)
  }

  /** USER-LEVEL differentially-private count release (ε-DP, Laplace
    * mechanism with bounded contribution — Dwork et al. 2006; the
    * per-user bounds are the step every production DP release gets
    * wrong first): releasing per-category event counts where one USER
    * may contribute unboundedly many rows needs the user's contribution
    * bounded in BOTH norms — (1) per-category: each user's count in any
    * one category capped at `cap` (L∞ bound), and (2) across
    * categories: each user contributes to at most `maxCats` categories
    * (L0 bound — kept deterministically: the user's `maxCats` largest
    * capped counts, ties broken by category). Removing one user then
    * shifts the released VECTOR by at most cap·maxCats in L1, so
    * Laplace(cap·maxCats/ε) noise per count gives user-level ε-DP; with
    * only the per-category cap the guarantee would degrade to kε for a
    * user touching k categories, k unbounded.
    *
    * Scale shape: three map-side-friendly stages — rows →
    * (user, category) partial counts (the only corpus-sized shuffle,
    * skinny keys), a per-user top-`maxCats` rank (window over the
    * already-reduced per-user frame — rows ∝ users·min(cats, maxCats)),
    * then capped sums → one row per category. The noise is
    * DETERMINISTIC: Laplace via inverse-CDF of the salted md5 unit
    * hash of the category ([[Mixing.hashUnit]] — engine-portable, so an
    * auditor replays the exact released values; a production release
    * would swap the salt for a secret drawn once). No rand(): task
    * retries and partition counts cannot change the release.
    *
    * Returns one row per category:
    * (category, n_capped, noise, n_released) — n_capped is the
    * pre-noise capped count (an audit column; a real release would drop
    * it), n_released = max(0, n_capped + noise) rounded to `scale`
    * decimals. */
  def dpCountRelease(df: DataFrame, userCol: String, catCol: String,
                     epsilon: Double, cap: Int, maxCats: Int, salt: String,
                     scale: Int = 4,
                     domain: Option[Seq[String]] = None): DataFrame = {
    require(epsilon > 0 && cap >= 1 && maxCats >= 1,
      s"need epsilon>0, cap>=1, maxCats>=1; got $epsilon, $cap, $maxCats")
    // The user-level ε-DP guarantee needs a DATA-INDEPENDENT output
    // support: without `domain`, a category contributed by a single user
    // appears iff that user participates — the row's PRESENCE leaks with
    // probability 1 and no amount of count noise hides it. Pass the
    // PUBLIC category domain to release noisy counts (including noisy
    // zeros) for exactly those categories; observed categories outside
    // the public domain are dropped, never leaked. The domain-less form
    // is kept for exploratory use where the category set itself is
    // already public knowledge — its scaladoc caveat is this comment.
    val perUser = df.groupBy(col(userCol).as("u"), col(catCol).as("category"))
      .agg(count(lit(1)).as("n_uc"))
    // L0 bound: keep each user's maxCats largest capped counts
    // (deterministic tie-break by category so retries can't flip the set).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u")
      .orderBy(least(col("n_uc"), lit(cap.toLong)).desc, col("category"))
    val bounded = perUser
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxCats)
    val observed = bounded.groupBy("category")
      .agg(sum(least(col("n_uc"), lit(cap.toLong))).as("n_capped"))
    val capped = domain match {
      case None => observed
      case Some(cats) =>
        require(cats.nonEmpty, "public domain must be non-empty")
        val spark = df.sparkSession
        import spark.implicits._
        // public support: every domain category gets a row (noisy zero
        // when unobserved); observed categories outside it are dropped
        cats.toDF("category").join(observed, Seq("category"), "left")
          .select(col("category"),
            coalesce(col("n_capped"), lit(0L)).as("n_capped"))
    }
    val uu = Mixing.hashUnit(col("category"), salt)
    // Laplace(b) inverse CDF at u∈[0,1): -b·sgn(u-½)·ln(1-2|u-½|); the
    // log argument is clamped at 2^-31 (u=0 would otherwise yield exactly
    // 0 → -Infinity), so noise magnitude is bounded by ~21.5·b.
    val b = cap.toDouble * maxCats / epsilon
    val noise = round(
      -lit(b) * signum(uu - 0.5d) *
        log(greatest(lit(1.0d) - lit(2.0d) * abs(uu - 0.5d),
          lit(4.656612873077393e-10))),
      scale)
    capped.select(col("category"), col("n_capped"),
      noise.as("noise"),
      round(greatest(lit(0.0d), col("n_capped") + noise), scale)
        .as("n_released"))
  }
}
