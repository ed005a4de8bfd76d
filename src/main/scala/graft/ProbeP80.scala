package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-timer for the p80 PPJoin path (dev tool, not part of
  * the query surface). */
object ProbeP80 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm pass
    SparkEntry.queries("p80_prefix_jaccard")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    graft.operators.Broadcasts.release(spark)
    for (rnd <- 1 to 4) {
      if (rnd >= 3) { System.gc(); Thread.sleep(2000) } // quiesce probe
      println(s"== round $rnd ==")
      val d = Tables.t(spark, dir, "documents")
      val shared = t("build shared (incl voc count+injectivity+rankSets count)") {
        graft.pipeline.Dedup.prefixJaccardShared(d, "doc_id", "text", 0.95)
      }
      val out = graft.operators.Broadcasts.trackedPersist(
        shared.pairs.select(col("i"), col("j"),
          round(col("jaccard"), 6).as("jaccard")))
      t("out.count (cands+verify chain)") { println("  " + out.count()) }
      val toks = shared.docSets.select(col("id"), col("tr").as("ts"))
      val probe = t("probe broadcast build") {
        broadcast(toks.filter(col("id") < 150)
          .select(col("id").as("i"), col("ts").as("ts_i")))
      }
      val truth = toks.select(col("id").as("j"), col("ts").as("ts_j"))
        .join(probe, col("i") < col("j") &&
          size(col("ts_i")).cast("double") >= lit(0.95) * size(col("ts_j")) &&
          size(col("ts_j")).cast("double") >= lit(0.95) * size(col("ts_i")))
        .withColumn("c", size(array_intersect(col("ts_i"), col("ts_j"))))
        .filter(col("c").cast("double") /
          (size(col("ts_i")) + size(col("ts_j")) - col("c")).cast("double")
          >= 0.95)
        .select("i", "j")
      t("gate anti-join count") {
        println("  missed " + truth
          .join(out.select("i", "j"), Seq("i", "j"), "left_anti").count())
      }
      t("orderBy + noop write") {
        out.orderBy("i", "j").write.format("noop").mode("overwrite").save()
      }
      graft.operators.Broadcasts.release(spark)
    }
    spark.stop()
  }
}
