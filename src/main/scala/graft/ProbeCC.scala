package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage probe for the group-split pipeline (not part of the
  * query surface): times pairs / CC / split separately. */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    for (round <- 1 to 2) {
      val pairs = time(s"r$round pairs+checkpoint") {
        graft.pipeline.Dedup.prefixJaccardPairs(d, "doc_id", "text", 0.95)
          .select("i", "j").localCheckpoint()
      }
      println(s"PROBE pairs rows ${pairs.count()}")
      val lab1 = time(s"r$round cc_minlabel") {
        val l = graft.pipeline.Dedup.connectedComponents(pairs)
        l.count(); l
      }
      val lab2 = time(s"r$round cc_alternating") {
        val l = graft.pipeline.Dedup.connectedComponentsAlternating(pairs)
        l.count(); l
      }
      time(s"r$round split_rest") {
        val withSplit = d.select(col("doc_id"))
          .join(lab1, col("doc_id") === col("v"), "left")
          .select(col("doc_id"),
            coalesce(col("lbl"), col("doc_id")).as("grp"))
          .withColumn("split",
            graft.pipeline.Mixing.splitAssign(
              graft.pipeline.Mixing.hashUnit(col("grp"), "gsplit")))
        withSplit.groupBy("split").count().collect()
      }
      lab2.count()
      graft.operators.Broadcasts.release(spark)
    }
    spark.stop()
  }
}
