package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Laws behind p102: Spark's count_min_sketch aggregate hashes executor
  * UTF8String bytes; the driver point-query hashes java String bytes —
  * these must read the SAME counters, or every estimate is garbage that
  * no loose bound reliably catches. Pinned here with a collision-free
  * sketch where estimates are exact. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("driver point queries read the executor-built counters (exact when collision-free)") {
    val words = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val bytes = words.toDF("w")
      .agg(count_min_sketch(col("w"), lit(0.001), lit(0.999), lit(7)))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    assert(cms.estimateCount("alpha") === 5L)
    assert(cms.estimateCount("beta") === 3L)
    assert(cms.estimateCount("gamma") === 1L)
    assert(cms.totalCount() === 9L)
  }

  test("sketches merge: two half-corpus sketches answer like one") {
    def build(ws: Seq[String]) = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(ws.toDF("w")
        .agg(count_min_sketch(col("w"), lit(0.001), lit(0.999), lit(7)))
        .head().getAs[Array[Byte]](0)))
    val a = build(Seq("x", "x", "y"))
    val b = build(Seq("x", "z"))
    val merged = a.mergeInPlace(b)
    assert(merged.estimateCount("x") === 3L)
    assert(merged.estimateCount("y") === 1L)
    assert(merged.estimateCount("z") === 1L)
  }
}
