package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DeflateRatioExpr — the compression-ratio quality signal. No DuckDB
  * oracle exists for zlib, so this spec carries the correctness load:
  * determinism, the ordinal law (repetitive ≪ prose < high-entropy),
  * the empty-input contract, and codegen/eval agreement. */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  private def ratio(s: String): Double = {
    CompressRatioExpr.register(spark)
    Seq(s).toDF("t").select(expr("graft_deflate_ratio(t)")).head().getDouble(0)
  }

  test("ordinal law: repetitive << prose < random-ish") {
    val repetitive = "all work and no play makes jack a dull boy " * 50
    val prose = "The quick brown fox jumps over the lazy dog while a " +
      "committee of historians debates the provenance of an obscure " +
      "manuscript found beneath the floorboards of a rural schoolhouse " +
      "sometime late in the nineteenth century, to general astonishment."
    // deterministic high-entropy junk: seeded draws over the 94 printable
    // ASCII symbols (~6.55 bits/char — hex's 16-symbol alphabet would
    // itself compress to ~0.5 and sit BELOW prose)
    val rng = new java.util.Random(42)
    val noisy = Array.fill(2000)((33 + rng.nextInt(94)).toChar).mkString
    val (rr, rp, rn) = (ratio(repetitive), ratio(prose), ratio(noisy))
    assert(rr < 0.1, f"repetitive text should crush: $rr%.3f")
    assert(rr < rp && rp < rn,
      f"ordering violated: repetitive $rr%.3f, prose $rp%.3f, noisy $rn%.3f")
  }

  test("deterministic, null-safe, empty contract, codegen == eval") {
    val s = "determinism probe " * 10
    assert(ratio(s) == ratio(s))
    assert(ratio("") == 1.0, "empty input pins ratio 1.0 by contract")
    CompressRatioExpr.register(spark)
    val df = Seq(Some(s), None).toDF("t")
      .select(expr("graft_deflate_ratio(t)").as("r"))
    val rows = df.collect()
    assert(rows(1).isNullAt(0), "null in, null out")
    // interpreted eval path must agree with the codegen'd one
    val interpreted = CompressKernels.deflateRatio(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(math.abs(rows(0).getDouble(0) - interpreted) == 0.0)
  }
}
