package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off p13 profiling probe (VERDICT r11 item 4): measure the
  * winnowing fingerprint document-frequency distribution and the
  * candidate volume Σ df·(df−1)/2 it implies, at a given sf dir.
  * Usage: runMain graft.ProbeWinnow <sfDir> [dfCap...]
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(0, 1000, 200, 50)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val posts = graft.pipeline.Dedup.winnowingPostingsProbe(d, "doc_id", "text")
      .persist()
    val df = posts.groupBy("bkt").agg(count(lit(1)).as("df")).persist()
    df.count()
    println("== fingerprint df distribution ==")
    df.select(
      count(lit(1)).as("n_fps"),
      sum("df").as("postings"),
      max("df").as("max_df"),
      expr("approx_percentile(df, array(0.5, 0.9, 0.99, 0.999))").as("pcts"),
      sum(col("df") * (col("df") - 1) / 2).as("cand_volume")).show(false)
    println("== top-20 hottest fingerprints ==")
    df.orderBy(col("df").desc).limit(20).show(false)
    for (cap <- caps) {
      val kept = if (cap <= 0) df else df.filter(col("df") <= cap)
      val row = kept.agg(
        sum(col("df") * (col("df") - 1) / 2).as("cand"),
        sum("df").as("posts"), count(lit(1)).as("fps")).head()
      println(s"dfCap=$cap -> candidates=${row.get(0)} postings=${row.get(1)} fps=${row.get(2)}")
    }
    // stage split at the shipped cap: candidate-pair distinct vs verify
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val hot = df.filter(col("df") > 1000).select("bkt")
    val usable = posts.join(broadcast(hot), Seq("bkt"), "left_anti")
    val a = usable.select(col("bkt"), col("id").as("i"))
    val b = usable.select(col("bkt"), col("id").as("j"))
    val cand = a.join(b, "bkt").filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("ns")).select("i", "j")
      .persist()
    val nPairs = timed("stage1 candidates")(cand.count())
    println(s"distinct candidate pairs: $nPairs")
    val based = d.select(col("doc_id").as("id"),
      graft.pipeline.TextOps.shingles(
        graft.pipeline.TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val hashedB = based.select(col("id"),
      transform(col("sh"), x => xxhash64(x)).as("shh")).persist()
    timed("hash-shingle materialize")(hashedB.count())
    val verified = timed("stage2 verify (long arrays)") {
      cand.join(hashedB.select(col("id").as("i"), col("shh").as("sh_i")), "i")
        .join(hashedB.select(col("id").as("j"), col("shh").as("sh_j")), "j")
        .withColumn("jac",
          size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
            size(array_union(col("sh_i"), col("sh_j"))).cast("double"))
        .filter(col("jac") >= 0.5).count()
    }
    println(s"verified pairs: $verified")
    val sizedP = based.select(col("id"), size(col("sh")).as("n")).persist()
    sizedP.count()
    val pruned = timed("size prefilter") {
      cand.join(sizedP.select(col("id").as("i"), col("n").as("n_i")), "i")
        .join(sizedP.select(col("id").as("j"), col("n").as("n_j")), "j")
        .filter(col("n_i") >= lit(0.5) * col("n_j") && col("n_j") >= lit(0.5) * col("n_i"))
        .select("i", "j").persist()
    }
    println(s"pruned candidates: ${timed("prune count")(pruned.count())}")
    val verified2 = timed("stage2 verify (pruned, long)") {
      pruned.join(hashedB.select(col("id").as("i"), col("shh").as("sh_i")), "i")
        .join(hashedB.select(col("id").as("j"), col("shh").as("sh_j")), "j")
        .withColumn("jac",
          size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
            size(array_union(col("sh_i"), col("sh_j"))).cast("double"))
        .filter(col("jac") >= 0.5).count()
    }
    println(s"verified2: $verified2")
    spark.stop()
  }
}
