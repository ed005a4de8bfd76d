package graft.queries

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.io.StreamLoad

/** The live stream-load sink (S11) on the VERIFIED path: an in-process
  * HTTP peer plays the engine's _stream_load endpoint, `nation` goes up
  * the wire from executor partitions (loadDataset — the cluster-scale
  * path, no driver disk round-trip), and the query's OUTPUT is what the
  * peer received, parsed back from the CSV wire shape. The DuckDB
  * oracle reads the same table straight from parquet, so any corruption
  * in wire formatting, separator handling, null encoding, or lost/dup
  * partition uploads breaks the row/hash compare.
  */
object IoQueries extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io01_streamload_roundtrip" -> ((s, dir) => {
      val received = new java.lang.StringBuilder
      val server = com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", { ex =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        received.synchronized { received.append(body) }
        val reply = """{"Status": "Success"}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, reply.length)
        ex.getResponseBody.write(reply)
        ex.close()
      })
      server.start()
      try {
        val cfg = StreamLoad.Config("127.0.0.1", server.getAddress.getPort)
        val df = Tables.t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        StreamLoad.loadDataset(df.repartition(4), cfg, "graft", "nation")
        // parse the wire bytes back: ☆-separated lines
        val lines = received.synchronized { received.toString }
          .split("\n").filter(_.nonEmpty).toSeq
        import s.implicits._
        lines.toDF("line")
          .select(split(col("line"), StreamLoad.ColumnSeparator).as("f"))
          .select(
            element_at(col("f"), 1).cast("int").as("n_nationkey"),
            element_at(col("f"), 2).as("n_name"),
            element_at(col("f"), 3).cast("int").as("n_regionkey"))
          .orderBy("n_nationkey")
      } finally server.stop(0)
    })
  )

  val oracles: Map[String, String] = Map(
    "io01_streamload_roundtrip" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS INT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}
