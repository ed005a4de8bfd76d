package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LangId — the char-n-gram multinomial router. The p104 oracle pins the
  * exact arithmetic (grams, smoothing, Σ cnt·logp, argmax) against
  * DuckDB; this spec carries what the oracle can't see: recall on
  * HELD-OUT sentences the seed model never saw, OOV behavior, and the
  * gram construction's agreement with a substring brute force. */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = LangId.seedModel(spark).cache()

  test("planted-language recall: held-out sentences classify to their language") {
    // none of these strings appear in LangId.Seeds — same languages,
    // different words, written to carry each language's character
    // statistics (function words, diacritics, han chars)
    val heldOut = Seq(
      ("en", "she walked into the garden and found that the old tree was still there"),
      ("en", "nobody could explain why the letters were sent to the wrong address"),
      ("de", "die kinder spielten den ganzen tag im garten und waren am abend müde"),
      ("de", "ich weiß nicht warum der zug schon wieder zu spät gekommen ist"),
      ("es", "los estudiantes llegaron temprano porque querían ver el comienzo de la función"),
      ("es", "no sé cuándo volverá mi hermana de su viaje por las montañas"),
      ("fr", "les étudiants sont arrivés tôt parce qu'ils voulaient voir le début du spectacle"),
      ("fr", "je ne sais pas quand ma sœur reviendra de son voyage dans les montagnes"),
      ("zh", "学生们很早就到了因为他们想看演出的开始"),
      ("zh", "我不知道我的姐姐什么时候从山里旅行回来"))
      .zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "lang_true", "text")
    val pred = LangId.classify(heldOut, "id", "text", model)
    val joined = heldOut.join(pred, "id")
      .select("id", "lang_true", "lang_pred")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wrong = joined.filter { case (_, t, p) => t != p }
    assert(wrong.isEmpty,
      s"held-out misclassifications: ${wrong.mkString(", ")}")
  }

  test("OOV text still classifies (floor path), and every score is finite") {
    val oov = Seq((1L, "qqq xxywz kjv qq zzz")).toDF("id", "text")
    val s = LangId.scores(oov, "id", "text", model).collect()
    assert(s.length == LangId.Seeds.length, "one score row per language")
    assert(s.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    assert(LangId.classify(oov, "id", "text", model).count() == 1L)
  }

  test("charGrams equals substring brute force; whitespace folds first") {
    def brute(s: String, n: Int): Seq[String] = {
      val norm = s.trim.toLowerCase.replaceAll("\\s+", " ")
      val cps = norm.codePoints().toArray
      (0 to cps.length - n).map(i => new String(cps, i, n))
    }
    for (s <- Seq("Hello  World", "a", "", "  padded  ", "敏捷的 狐狸", "c'est très");
         n <- Seq(1, 2, 3)) {
      val got = Seq(Tuple1(s)).toDF("t")
        .select(LangId.charGrams(col("t"), n).as("g"))
        .head().getSeq[String](0)
      assert(got == brute(s, n), s"text='$s' n=$n: $got vs ${brute(s, n)}")
    }
  }

  test("model invariants: probabilities under 1, floors below every in-vocab logp") {
    val m = model.collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getDouble(2) < 0.0), "logp must be negative")
    val floorByLang = m.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(m.forall(r => r.getDouble(2) > floorByLang(r.getString(0))),
      "an observed gram (cnt >= 1) must always beat the OOV floor")
    // per-language probabilities sum under 1 (add-one mass is reserved
    // for the unseen part of the shared vocabulary)
    val sums = model.groupBy("lang").agg(sum(exp(col("logp"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(sums.forall(_._2 < 1.0 + 1e-12), s"prob mass over 1: ${sums.toSeq}")
  }

  test("aggregate-first scores equal the direct per-gram fan-out on a randomized model") {
    // ADVICE r13: the r13 rewrite changed fp association before the 1e-6
    // round (Σ cnt·(logp−logp_oov) + n_g·logp_oov vs the per-gram
    // coalesce sum) and assumes one distinct logp_oov per lang. Pin both
    // on a seeded randomized corpus/model: trainNgramModel structurally
    // guarantees the one-floor invariant, and the rounded scores must
    // match the direct formulation exactly.
    val rng = new scala.util.Random(0xC0FFEE)
    val alphabet = "abcdefgh "
    def randText(len: Int): String =
      (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val labeled = (1 to 6).map(i => (s"l${i % 3}", randText(80 + rng.nextInt(60))))
      .toDF("lang", "text")
    val m = LangId.trainNgramModel(labeled, "lang", "text").cache()
    // one distinct floor per language (the rewrite's standing assumption)
    val nFloors = m.select("lang", "logp_oov").distinct()
      .groupBy("lang").count().agg(max("count")).head().getLong(0)
    assert(nFloors == 1L, "trainNgramModel must emit one logp_oov per lang")
    val docs = (1L to 8L).map(i => (i, randText(40 + rng.nextInt(40))))
      .toDF("id", "text")
    val got = LangId.scores(docs, "id", "text", m)
    // direct formulation: fan the gram stream out ×|langs|, coalesce to
    // the floor per (gram, lang), then one rollup — the pre-r13 plan
    val grams = docs.select(col("id"), explode(LangId.charGrams(col("text"), 2)).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
    val langs = m.select("lang", "logp_oov").distinct()
    val direct = grams.crossJoin(langs)
      .join(m.select("lang", "gram", "logp"), Seq("lang", "gram"), "left")
      .groupBy("id", "lang")
      .agg(round(sum(col("cnt") * coalesce(col("logp"), col("logp_oov"))), 6).as("score_direct"))
    val diff = got.join(direct, Seq("id", "lang"))
      .filter(col("score") =!= col("score_direct")).collect()
    assert(diff.isEmpty, s"score mismatch rows: ${diff.mkString("; ")}")
    m.unpersist()
  }
}
