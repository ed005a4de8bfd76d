package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_vec_sum — one-pass elementwise vector-sum aggregate. */
class VecSumSpec extends SparkSpec {
  import spark.implicits._

  test("sums elementwise across rows and partitions") {
    VecSumAgg.register(spark)
    val df = spark.range(1000).repartition(8)
      .select(array(col("id").cast("double"),
        (col("id") * 2).cast("double"), lit(1.0d)).as("v"))
    val s = df.agg(expr("graft_vec_sum(v)")).head().getSeq[Double](0)
    assert(s === Seq(499500.0, 999000.0, 1000.0))
  }

  test("null rows are skipped; all-null input yields null") {
    VecSumAgg.register(spark)
    val mixed = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v")
    assert(mixed.agg(expr("graft_vec_sum(v)")).head().getSeq[Double](0)
      === Seq(4.0, 6.0))
    val allNull = Seq.empty[Seq[Double]].toDF("v")
    assert(allNull.agg(expr("graft_vec_sum(v)")).head().isNullAt(0))
  }

  test("ragged vectors fail loudly") {
    VecSumAgg.register(spark)
    val ragged = Seq(Seq(1.0), Seq(1.0, 2.0)).toDF("v").coalesce(1)
    val e = intercept[Exception] {
      ragged.agg(expr("graft_vec_sum(v)")).head()
    }
    assert(e.getMessage.contains("ragged") ||
      e.getCause != null && e.getCause.getMessage.contains("ragged"))
  }

  test("matches the posexplode groupBy form on the whiten moment vector") {
    VecSumAgg.register(spark)
    val df = spark.range(200)
      .select(array((0 until 4).map(i =>
        sin(col("id") * (i + 1)).cast("double")): _*).as("x"))
      .select(concat(array(lit(1.0d)), col("x")).as("m"))
    val viaAgg = df.agg(expr("graft_vec_sum(m)")).head().getSeq[Double](0)
    val viaExplode = df.select(posexplode(col("m")).as(Seq("p", "v")))
      .groupBy("p").agg(sum("v").as("s")).orderBy("p")
      .collect().map(_.getDouble(1)).toSeq
    viaAgg.zip(viaExplode).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }
}
