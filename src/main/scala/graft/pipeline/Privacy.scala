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
}
