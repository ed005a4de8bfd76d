package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted inner join result equals the plain join (skewed fact side)") {
    import spark.implicits._
    // skew: key 1 holds 90% of the fact rows
    val fact = spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("v"))
    val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), first("name").as("nm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val salted = SkewJoin.salted(fact, dim, "k", salts = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"), first("name").as("nm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(salted == plain)
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("k", "v")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("k", "name")
    val out = SkewJoin.salted(fact, dim, "k", salts = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(out == Set((1L, "a", Some("d1")), (2L, "b", Some("d2")), (99L, "nomatch", None)))
  }

  test("join key includes the salt (the spread actually happens)") {
    import spark.implicits._
    val fact = Seq((1L, "a")).toDF("k", "v")
    val dim = Seq((1L, "d1")).toDF("k", "name")
    val plan = SkewJoin.salted(fact, dim, "k", salts = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
  }

  test("real tables: salted orders x customer equals plain join") {
    val orders = Tables.t(spark, dir, "orders").select("o_custkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "custkey")
    val cust = Tables.t(spark, dir, "customer").select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "custkey")
    val plain = orders.join(cust, Seq("custkey")).count()
    val salted = SkewJoin.salted(orders, cust, "custkey", salts = 8).count()
    assert(plain == salted)
  }

  test("saltedAgg equals direct groupBy for every mergeable measure") {
    import graft.operators.SkewJoin.Measure
    val ev = Tables.t(spark, dir, "events")
      .withColumn("dval", col("value").cast("decimal(18,6)"))
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("dval")).as("s"),
        min(col("user_id")).as("mn"), max(col("user_id")).as("mx"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val salted = SkewJoin.saltedAgg(ev, Seq("event_type"),
      Seq(Measure("count", "", "n"), Measure("sum", "dval", "s"),
        Measure("min", "user_id", "mn"), Measure("max", "user_id", "mx")),
      salts = 16)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(salted == direct)
  }

  test("saltedAgg rejects non-mergeable measures and duplicate names") {
    import graft.operators.SkewJoin.Measure
    val ev = Tables.t(spark, dir, "events")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedAgg(ev, Seq("event_type"),
        Seq(Measure("median", "value", "m")))
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedAgg(ev, Seq("event_type"),
        Seq(Measure("count", "", "n"), Measure("max", "value", "n")))
    }
  }
}
