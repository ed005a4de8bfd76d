package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapSpec extends SparkSpec {

  private def registered = { BitmapExprs.register(spark); spark }

  test("bitmap_agg counts exact distinct, merging across partitions") {
    val s = registered
    import s.implicits._
    // 10k values with duplicates, spread over 8 partitions so partial
    // buffers must serialize + merge across the exchange
    val df = s.range(0, 10000, 1, 8).select((col("id") % 2500).as("v"))
    val n = df.agg(call_function("graft_bitmap_count",
      call_function("graft_bitmap_agg", col("v"))).as("n"))
      .head().getLong(0)
    assert(n == 2500)
  }

  test("union_agg over saved sketches equals direct agg; and/or/contains work") {
    val s = registered
    import s.implicits._
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 3L), ("b", 4L), ("b", 1000000L)).toDF("g", "v")
    val per = df.groupBy("g").agg(call_function("graft_bitmap_agg", col("v")).as("bm"))
    val total = per.agg(call_function("graft_bitmap_count",
      call_function("graft_bitmap_union_agg", col("bm")))).head().getLong(0)
    assert(total == 5) // {1,2,3,4,1000000}

    val row = per.filter(col("g") === "a").crossJoin(
      per.filter(col("g") === "b").select(col("bm").as("bm2")))
      .select(
        call_function("graft_bitmap_count",
          call_function("graft_bitmap_and", col("bm"), col("bm2"))).as("n_and"),
        call_function("graft_bitmap_count",
          call_function("graft_bitmap_or", col("bm"), col("bm2"))).as("n_or"),
        call_function("graft_bitmap_contains", col("bm"), lit(2L)).as("has2"),
        call_function("graft_bitmap_contains", col("bm"), lit(4L)).as("has4"))
      .head()
    assert(row.getLong(0) == 1)      // {3}
    assert(row.getLong(1) == 5)
    assert(row.getBoolean(2))
    assert(!row.getBoolean(3))
  }

  test("empty input yields an empty bitmap, count 0") {
    val s = registered
    import s.implicits._
    val n = Seq.empty[Long].toDF("v")
      .agg(call_function("graft_bitmap_count",
        call_function("graft_bitmap_agg", col("v")))).head().getLong(0)
    assert(n == 0)
  }

  test("serialized form is canonical: same set, different build orders") {
    val a = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    Seq(5L, 1L, 9L, 1L << 40).foreach(a.addLong)
    val b = new org.roaringbitmap.longlong.Roaring64NavigableMap()
    Seq(1L << 40, 9L, 1L, 5L).foreach(b.addLong)
    assert(java.util.Arrays.equals(BitmapOps.ser(a), BitmapOps.ser(b)))
    assert(BitmapOps.count(BitmapOps.ser(a)) == 4)
  }

  test("driver entry q32 shape on sf0.001: exact counts agree with countDistinct") {
    val df = graft.SparkEntry.queries("q32_sketch_agg")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.keySet == Set("A", "N", "R", "MERGED", "A&R"))
    assert(rows.values.forall(_._2), s"hll_ok false somewhere: $rows")
    val li = graft.Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val exactAll = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(rows("MERGED")._1 == exactAll)
  }
}
