package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private def registered = { TopKAgg.register(spark); spark }

  test("exact when distinct <= capacity, merging across partitions") {
    val s = registered
    import s.implicits._
    // 8 distinct values, capacity 16 → exact counts; 8 partitions force
    // partial-summary serialization + merge
    val df = s.range(0, 8000, 1, 8)
      .select(concat(lit("v"), (col("id") % 8)).as("v"))
    val top = df.agg(expr("graft_topn(v, 3, 16)").as("t"))
      .selectExpr("inline(t)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // uniform counts (1000 each) → ties broken by value asc
    assert(top.toSeq == Seq(("v0", 1000L, 0L), ("v1", 1000L, 0L), ("v2", 1000L, 0L)))
  }

  test("approximate regime: SpaceSaving bound est-err <= true <= est holds") {
    val s = registered
    import s.implicits._
    // zipf-ish skew: value j appears ~ N/(j+1) times, 200 distinct,
    // capacity 32 → eviction fires, counts become estimates
    val rows = (0 until 200).flatMap(j => Seq.fill(2000 / (j + 1))(s"k$j"))
    val df = s.sparkContext.parallelize(rows, 8).toDF("v")
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = df.agg(expr("graft_topn(v, 10, 32)").as("t"))
      .selectExpr("inline(t)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.length == 10)
    top.foreach { case (v, est, err) =>
      val t = trueCounts(v)
      assert(est >= t, s"$v: est $est below true $t (SpaceSaving never undercounts)")
      assert(est - err <= t, s"$v: lower bound ${est - err} above true $t")
    }
    // the unambiguous heavy hitters (k0..k2: 2000, 1000, 666 >> tail) survive
    val got = top.map(_._1).toSet
    assert(Set("k0", "k1", "k2").subsetOf(got), s"lost a heavy hitter: $got")
  }

  test("merge never undercounts: eviction + re-insertion across partials") {
    // Adversarial partial order: v is small in s1 (trimmed away by the
    // s1+s2 merge overflow), then huge in s3. The mergeable-summaries
    // combine must keep est >= true by charging absence with the full
    // summary's min counter.
    val cap = 4
    def summary(counts: (String, Long)*): SpaceSaving.Summary = {
      val s = new SpaceSaving.Summary(cap)
      counts.foreach { case (v, c) => s.offer(v, c) }
      s
    }
    val s1 = summary("v" -> 10L, "a" -> 50L, "b" -> 60L, "c" -> 70L)
    val s2 = summary("d" -> 80L, "e" -> 90L, "f" -> 100L, "g" -> 110L)
    val s3 = summary("v" -> 500L, "x" -> 5L, "y" -> 5L, "z" -> 5L)
    val trueCounts = Map("v" -> 510L, "a" -> 50L, "b" -> 60L, "c" -> 70L,
      "d" -> 80L, "e" -> 90L, "f" -> 100L, "g" -> 110L,
      "x" -> 5L, "y" -> 5L, "z" -> 5L)
    s1.merge(s2) // overflows: v (count 10) is trimmed here
    s1.merge(s3) // v re-enters with a big count
    s1.topK(cap).foreach { case (v, est, err) =>
      val t = trueCounts(v)
      assert(est >= t, s"$v: est $est undercounts true $t after merge trim")
      assert(est - err <= t, s"$v: lower bound ${est - err} above true $t")
    }
    // the genuinely dominant value must survive and bound its true count
    val top = s1.topK(1).head
    assert(top._1 == "v" && top._2 >= 510L)
  }

  test("driver entry q36 matches exact top-3 per bucket on sf0.001") {
    val df = graft.SparkEntry.queries("q36_topn_sketch")(spark, "/root/testdata/sf0.001")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
    val exact = ev.groupBy((col("user_id") % 10).as("bucket"), col("event_type").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")
          .orderBy(col("cnt").desc, col("value"))))
      .filter(col("rank") <= 3)
      .select("bucket", "rank", "value", "cnt")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2), r.getLong(3)))
    assert(got.sorted.toSeq == exact.sorted.toSeq)
  }
}
