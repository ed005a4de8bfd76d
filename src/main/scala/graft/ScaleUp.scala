package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesizes a ×`factor` corpus from an sf dir for the 100×-story
  * probe (VERDICT r7 item 10): ScalingSpec's 500→5000-doc slope guards
  * can't see memory pressure, spill, or broadcast-gate flips — one real
  * run at 10× can. Replicas shift every key space so they stay disjoint
  * (cluster structure scales linearly, the way a genuinely bigger crawl
  * does) and salt text/names with replica-distinct tokens so
  * cross-replica docs do NOT become ≥0.95 near-dups (10 verbatim copies
  * would square every dup cluster instead — a different corpus, not a
  * bigger one). Replica 0 is byte-identical to the source, so the
  * scaled dir strictly contains it. Embedding vectors get a
  * replica-dependent nudge on one component for the same reason.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = broadcast(spark.range(factor).select(col("id").as("rep")))
    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    val d = t("documents")
    val maxDoc = d.agg(max("doc_id")).head().getLong(0) + 1
    val salted = when(col("rep") === 0, col("text")).otherwise(concat_ws(" ",
      col("text"),
      concat(lit("zrep"), col("rep")), concat(lit("zsalt"), col("rep")),
      concat(lit("zmark"), col("rep")), concat(lit("ztag"), col("rep"))))
    w(d.crossJoin(reps).select(
      (col("doc_id") + col("rep") * maxDoc).as("doc_id"),
      salted.as("text"), col("lang"), col("source"),
      length(salted).cast("long").as("n_chars")), "documents")

    val e = t("embeddings")
    val maxVec = e.agg(max("vec_id")).head().getLong(0) + 1
    w(e.crossJoin(reps).select(
      (col("vec_id") + col("rep") * maxVec).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + col("rep").cast("float") * lit(0.0137f))
          .otherwise(x)).as("embedding"),
      col("label")), "embeddings")

    val li = t("lineitem")
    val Array(maxO, maxP, maxS) = li.agg(max("l_orderkey"), max("l_partkey"),
      max("l_suppkey")).head().toSeq.map(_.asInstanceOf[Long] + 1).toArray
    w(li.crossJoin(reps).select(
      (col("l_orderkey") + col("rep") * maxO).as("l_orderkey"),
      (col("l_partkey") + col("rep") * maxP).as("l_partkey"),
      (col("l_suppkey") + col("rep") * maxS).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    val p = t("part")
    val maxPart = p.agg(max("p_partkey")).head().getLong(0) + 1
    w(p.crossJoin(reps).select(
      (col("p_partkey") + col("rep") * maxPart).as("p_partkey"),
      when(col("rep") === 0, col("p_name"))
        .otherwise(concat(col("p_name"), lit(" r"), col("rep"))).as("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part")

    // remaining tables copy through unscaled (probe queries don't stress
    // them; copying keeps every SparkEntry query runnable on the dir)
    Seq("region", "nation", "customer", "supplier", "orders", "events")
      .foreach(n => w(t(n), n))
    println(s"SCALEUP done: $out at ${factor}x of $src")
    spark.stop()
  }
}
