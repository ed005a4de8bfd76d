package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed co-located joins: the join on the bucket keys must plan with
  * zero Exchange on either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables sort-merge-join with no shuffle") {
    val left = (1L to 10000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 10000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bk_left", Seq("k"), numBuckets = 8)
    Bucketing.writeBucketed(right, "bk_right", Seq("k"), numBuckets = 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no Exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 10000)
      // the same join on non-bucketed tables DOES shuffle (control)
      left.write.mode("overwrite").saveAsTable("nb_left")
      right.write.mode("overwrite").saveAsTable("nb_right")
      val plain = spark.table("nb_left").join(spark.table("nb_right"), "k")
      assert(!Bucketing.isShuffleFree(plain))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("bk_left", "bk_right", "nb_left", "nb_right")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("isShuffleFree: a broadcast-join plan is shuffle-free (BroadcastExchange is not a shuffle)") {
    val big = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v")
    val dim = (1L to 10L).map(i => (i, s"d$i")).toDF("k", "d")
    val joined = big.join(org.apache.spark.sql.functions.broadcast(dim), "k")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      "control: the plan does broadcast")
    assert(Bucketing.isShuffleFree(joined),
      "a string grep on 'Exchange ' would false-flag this plan")
  }
}
