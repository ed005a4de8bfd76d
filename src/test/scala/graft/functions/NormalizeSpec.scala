package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_nfc / graft_strip_accents compiled kernels: composition,
  * accent stripping, idempotence, null propagation. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(s: String, fn: String): String = {
    NormalizeExprs.register(spark)
    Seq(Tuple1(s)).toDF("t")
      .select(call_function(fn, col("t"))).head().getString(0)
  }

  test("nfc composes decomposed sequences; composed input is unchanged") {
    val composed = "caf\u00e9 touch\u00e9"
    val decomposed = "cafe\u0301 touche\u0301"
    assert(run(decomposed, "graft_nfc") === composed)
    assert(run(composed, "graft_nfc") === composed)
    assert(run("plain ascii", "graft_nfc") === "plain ascii")
  }

  test("strip_accents drops combining marks from either input form") {
    assert(run("caf\u00e9", "graft_strip_accents") === "cafe")
    assert(run("cafe\u0301", "graft_strip_accents") === "cafe")
    assert(run("m\u00fchleisen", "graft_strip_accents") === "muhleisen")
    assert(run("no accents here", "graft_strip_accents") === "no accents here")
  }

  test("both kernels are idempotent and null-propagating") {
    val once = run("cafe\u0301", "graft_nfc")
    assert(run(once, "graft_nfc") === once)
    NormalizeExprs.register(spark)
    val r = Seq(Tuple1(null: String)).toDF("t")
      .select(call_function("graft_nfc", col("t")),
        call_function("graft_strip_accents", col("t"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
