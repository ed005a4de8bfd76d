package graft.io

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** S12: export templating + direct distributed write. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("URL templating and CSV wire-shape export") {
    val dir = Files.createTempDirectory("export").toString
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String])).toDF("id", "v")
    val url = Export.export(df, s"file://$dir/{db}/{table}", "shop", "orders")
    assert(url == s"file://$dir/shop/orders")
    val lines = Files.list(java.nio.file.Paths.get(s"$dir/shop/orders"))
      .iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".csv"))
      .flatMap(p => scala.io.Source.fromFile(p.toFile, "UTF-8").getLines())
      .sorted
    assert(lines == Seq("1☆a", "2☆\\N")) // ☆ sep, \N nulls
  }

  test("parquet export writes readable files") {
    val dir = Files.createTempDirectory("export_pq").toString
    val df = Seq((1L, "x")).toDF("id", "v")
    Export.export(df, s"$dir/{table}", "d", "t", Export.Options(format = "parquet"))
    assert(spark.read.parquet(s"$dir/t").count() == 1)
  }
}
