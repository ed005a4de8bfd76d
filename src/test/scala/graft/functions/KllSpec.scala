package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_kll / graft_kll_merge / graft_kll_quantiles — the KLL quantile
  * member of the mergeable-sketch family. */
class KllSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch answers exactly (inclusive rank)") {
    KllAgg.register(spark)
    // 1..100 distinct values, k=200 > n: every value retained.
    // INCLUSIVE quantile q = smallest v with (#<=v)/n >= q.
    val qs = spark.range(1, 101).select(col("id").cast("double").as("v"))
      .selectExpr("graft_kll(v, 200) AS sk")
      .selectExpr("graft_kll_quantiles(sk, array(0.25D, 0.5D, 0.99D, 1.0D)) AS q")
      .head().getSeq[Double](0)
    assert(qs === Seq(25.0, 50.0, 99.0, 100.0))
  }

  test("merge of shard sketches stays inside the rank envelope of the exact") {
    KllAgg.register(spark)
    val k = 200
    val n = 50000
    // deterministic pseudo-random doubles, skewed (squared uniform)
    val base = spark.range(n).select(col("id"),
      pow(sin(col("id") * 12.9898) * 43758.5453 % 1.0, 2).as("v"))
    val data = base.select("v")
    val shards = base.withColumn("shard", pmod(col("id") * 2654435761L, lit(7)))
    val merged = shards.groupBy("shard")
      .agg(expr(s"graft_kll(v, $k)").as("sk"))
      .agg(expr(s"graft_kll_merge(sk, $k)").as("sk"))
    val bulk = data.agg(expr(s"graft_kll(v, $k)").as("sk"))
    val tol = 2.0 * Kll.rankError(k)
    val sorted = data.orderBy("v").collect().map(_.getDouble(0))
    for (df <- Seq(merged, bulk); q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = df.selectExpr(s"graft_kll_quantiles(sk, array(${q}D)) AS e")
        .head().getSeq[Double](0).head
      val lo = sorted(math.max(0, ((q - tol) * (n - 1)).floor.toInt))
      val hi = sorted(math.min(n - 1, ((q + tol) * (n - 1)).ceil.toInt))
      assert(est >= lo && est <= hi,
        s"q=$q est=$est outside exact rank envelope [$lo, $hi]")
    }
  }

  test("serialization round-trips through the buffer codec") {
    val sk = Kll.empty(64)
    (1 to 1000).foreach(i => sk.update(i.toDouble))
    val copy = Kll.fromBytes(sk.toByteArray)
    assert(copy.getN === sk.getN)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(copy.getQuantile(q) === sk.getQuantile(q))
  }

  test("quantiles of an empty sketch are null") {
    KllAgg.register(spark)
    val r = spark.range(10).filter(col("id") < 0)
      .select(col("id").cast("double").as("v"))
      .selectExpr("graft_kll(v, 64) AS sk")
      .selectExpr("graft_kll_quantiles(sk, array(0.5D)) AS q")
      .head()
    assert(r.isNullAt(0))
  }

  test("merge is order-insensitive on quantile answers within tolerance") {
    // KLL merge is randomized internally, so bit-identity across orders
    // is not the law — the rank-error contract is. Both orders must
    // agree with the exact median within the envelope.
    KllAgg.register(spark)
    val a = Kll.empty(128); val b = Kll.empty(128)
    (1 to 20000).foreach(i => a.update(i.toDouble))
    (20001 to 40000).foreach(i => b.update(i.toDouble))
    val ab = Kll.empty(128); ab.merge(Kll.fromBytes(a.toByteArray)); ab.merge(Kll.fromBytes(b.toByteArray))
    val ba = Kll.empty(128); ba.merge(Kll.fromBytes(b.toByteArray)); ba.merge(Kll.fromBytes(a.toByteArray))
    val tol = 2.0 * Kll.rankError(128) * 40000
    for (s <- Seq(ab, ba))
      assert(math.abs(s.getQuantile(0.5) - 20000.0) <= tol,
        s"median ${s.getQuantile(0.5)} off by more than $tol")
  }
}
