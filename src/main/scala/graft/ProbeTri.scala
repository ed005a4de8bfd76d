package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage probe for p77: edge build vs orientation vs closure,
  * and array_intersect vs the sorted-merge count kernel. */
object ProbeTri {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 2) {
      val byOrder = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val edges = byOrder
        .filter(size(col("ps")) <= 32)
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
            struct(x.as("u"), y.as("v")))))).as("e"))
        .select(col("e.u").cast("long").as("u"),
          col("e.v").cast("long").as("v"))
        .distinct().localCheckpoint()
      time(s"r$r edges_build") { println("PROBE edges " + edges.count()) }
      val deg = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val oriented = edges
        .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
        .localCheckpoint() // checkpoint, not persist: survives the release between variants
      time(s"r$r orientation") { oriented.count() }
      def closure(useKernel: Boolean): Long = {
        val adj = graft.operators.Broadcasts.sizeGated(
          oriented.groupBy("src")
            .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
        val joined = oriented
          .join(adj, "src").select(col("dst"), col("nbrs").as("nu"))
          .join(adj.withColumnRenamed("src", "dst"), "dst")
        val agg =
          if (useKernel) joined.agg(coalesce(
            sum(expr("graft_sorted_intersect_count(nu, nbrs)")), lit(0L)))
          else joined.agg(coalesce(
            sum(size(array_intersect(col("nu"), col("nbrs")))), lit(0L)))
        agg.head().getLong(0)
      }
      // release between the variants: the second would otherwise read
      // the first's cached adjacency via canonicalized-plan substitution
      if (r % 2 == 1) {
        time(s"r$r closure_kernel") { println("PROBE tri " + closure(true)) }
        graft.operators.Broadcasts.release(spark)
        time(s"r$r closure_array_intersect") { println("PROBE tri " + closure(false)) }
      } else {
        time(s"r$r closure_array_intersect") { println("PROBE tri " + closure(false)) }
        graft.operators.Broadcasts.release(spark)
        time(s"r$r closure_kernel") { println("PROBE tri " + closure(true)) }
      }
      graft.operators.Broadcasts.release(spark)
    }
    spark.stop()
  }
}
