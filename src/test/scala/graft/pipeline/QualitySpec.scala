package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row

class QualitySpec extends SparkSpec {

  private def metricsOf(texts: (Long, String)*): Map[Long, Row] = {
    val s = spark
    import s.implicits._
    Quality.metrics(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("line repetition metrics (corpus is single-line; fixtures aren't)") {
    val m = metricsOf(
      1L -> "alpha beta\nalpha beta\ngamma delta\nalpha beta",
      2L -> "one two\nthree four")
    val r1 = m(1L)
    assert(r1.getAs[Long]("n_lines") == 4)
    // "alpha beta" ×3 → 2 repeat occurrences of 4 total
    assert(math.abs(r1.getAs[Double]("dup_line_frac") - 0.5) < 1e-9)
    // dup chars = 3×10 of total 3×10+11
    assert(math.abs(r1.getAs[Double]("dup_line_char_frac") - 30.0 / 41) < 1e-9)
    val r2 = m(2L)
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
    assert(r2.getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("bullet-line fraction counts -, *, • lines after left-trim") {
    val m = metricsOf(3L -> "- item one\n  * item two\nplain\n• dot")
    assert(math.abs(m(3L).getAs[Double]("bullet_line_frac") - 0.75) < 1e-9)
  }

  test("top-bigram and duplicated-trigram char fractions") {
    // "a b a b a b": bigrams a b(×3), b a(×2); trigrams a b a(×2), b a b(×2)
    val m = metricsOf(4L -> "a b a b a b", 5L -> "u v w x y z")
    val r4 = m(4L)
    // top bigram "a b" ×3, len 3, text len 11
    assert(math.abs(r4.getAs[Double]("top_bigram_char_frac") - 9.0 / 11) < 1e-9)
    // all 4 trigrams are duplicated occurrences → fraction 1.0
    assert(r4.getAs[Double]("dup_trigram_char_frac") == 1.0)
    val r5 = m(5L)
    assert(r5.getAs[Double]("dup_trigram_char_frac") == 0.0)
    assert(r5.getAs[Double]("type_token_ratio") == 1.0)
  }

  test("symbol/word ratio counts # and non-overlapping ellipses") {
    val m = metricsOf(6L -> "see #tag and more.... ok")
    // '#'×1 + '....' → one '...' (non-overlapping) = 2 symbols / 5 tokens
    assert(math.abs(m(6L).getAs[Double]("symbol_word_ratio") - 2.0 / 5) < 1e-9)
  }

  test("keep gate: repetitive and low-diversity docs are dropped") {
    val m = metricsOf(
      7L -> "the quick brown fox jumps over the lazy dog near banks today",
      8L -> "spam spam spam spam spam spam spam spam spam spam")
    assert(m(7L).getAs[Boolean]("keep"))
    assert(!m(8L).getAs[Boolean]("keep"))   // ttr 0.1, top bigram mass high
  }

  test("degenerate inputs: empty and single-token docs don't divide by zero") {
    val m = metricsOf(9L -> "", 10L -> "word")
    Seq(9L, 10L).foreach { id =>
      val r = m(id)
      assert(r.getAs[Double]("top_bigram_char_frac") == 0.0)
      assert(r.getAs[Double]("dup_trigram_char_frac") == 0.0)
      assert(!r.getAs[Double]("type_token_ratio").isNaN)
    }
  }

  test("classifierScore: fluent prose outranks digit/symbol soup; gate uses rounded score") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox and the lazy dog are friends in this story of the meadow"),
      (2L, "8x9!!! 77##&& 0101 ??? !!! 4442 ### 9999 !!!! 00"),
      (3L, "")).toDF("doc_id", "text")
    val out = Quality.classifierScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("score") > out(2L).getAs[Double]("score"))
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("keep"))
    // degenerate doc scores finite and gates deterministically
    val s3 = out(3L).getAs[Double]("score")
    assert(!s3.isNaN && s3 >= 0.0 && s3 <= 1.0)
    // keep is exactly (rounded score >= threshold) — the cross-engine
    // contract the oracle relies on
    out.values.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[Double]("score") >= 0.5))
    }
  }

  test("expectations: per-rule violation counts, uniqueness, one row per rule") {
    import org.apache.spark.sql.functions.{col, length}
    import spark.implicits._
    val df = Seq(
      (1L, "hello world", "en"),
      (2L, "", "en"),       // empty text
      (3L, "ok doc", "xx"), // bad lang
      (3L, "dup id", "en")  // duplicate doc_id
    ).toDF("doc_id", "text", "lang")
    val out = Quality.expectations(df,
      rowRules = Seq(
        "text_nonempty" -> (col("text").isNull || length(col("text")) === 0),
        "lang_allowed" -> !col("lang").isin("en", "de")),
      uniqueCols = Seq("doc_id")).collect()
    assert(out.length === 3)
    val byRule = out.map(r => r.getAs[String]("rule") -> r).toMap
    assert(byRule.keySet === Set("text_nonempty", "lang_allowed", "unique_doc_id"))
    out.foreach(r => assert(r.getAs[Long]("n_rows") === 4L))
    assert(byRule("text_nonempty").getAs[Long]("n_violations") === 1L)
    assert(byRule("lang_allowed").getAs[Long]("n_violations") === 1L)
    assert(byRule("unique_doc_id").getAs[Long]("n_violations") === 1L)
    out.foreach(r => assert(
      r.getAs[Boolean]("pass") === (r.getAs[Long]("n_violations") == 0L)))
    // output order is by rule name (the cross-engine contract)
    assert(out.map(_.getAs[String]("rule")).toSeq ===
      Seq("lang_allowed", "text_nonempty", "unique_doc_id"))
  }

  test("expectations on an EMPTY table: every rule verdicts (0, pass=true), no null pass") {
    val empty = spark.emptyDataFrame.selectExpr("CAST(null AS LONG) AS id",
      "CAST(null AS STRING) AS nm").limit(0)
    import org.apache.spark.sql.functions.{col => c}
    val out = Quality.expectations(empty,
      Seq("id_positive" -> (c("id") <= 0), "nm_nonnull" -> c("nm").isNull),
      uniqueCols = Seq("id")).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_violations") == 0L, s"rule ${r.getString(0)}")
      assert(r.getAs[Boolean]("pass"), s"rule ${r.getString(0)} must pass")
    }
  }

  test("expectations: all-green suite passes every rule") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Quality.expectations(df,
      rowRules = Seq("id_not_null" -> col("doc_id").isNull),
      uniqueCols = Seq("doc_id")).collect()
    assert(out.forall(_.getAs[Boolean]("pass")))
    assert(out.forall(_.getAs[Long]("n_violations") == 0L))
  }
}
