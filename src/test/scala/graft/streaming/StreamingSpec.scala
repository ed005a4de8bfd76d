package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Structured Streaming parity: the SAME windowed-agg operator runs over
  * a stream (file source, AvailableNow) and must produce the batch
  * result — the backfill/live-ingest equivalence a production event
  * pipeline relies on. */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg (watermark, append) matches the batch result") {
    val dir = "/root/testdata/sf0.001"
    val batch = EventStream.windowedAgg(Tables.t(spark, dir, "events"))
      .orderBy("hour_start", "event_type").collect()

    // the file stream source wants a directory
    val streamDir = java.nio.file.Files.createTempDirectory("ev_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamIn = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val q = EventStream.windowedAggStream(streamIn)
      .writeStream.format("memory").queryName("ev_agg")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode only emits windows the watermark has closed; with
    // AvailableNow the final watermark closes all but the last window(s),
    // so compare on the emitted prefix and require real coverage
    val streamed = spark.table("ev_agg")
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.nonEmpty, "stream emitted nothing")
    val batchByKey = batch.map(r => (r.get(0), r.get(1)) -> r.toSeq).toMap
    streamed.foreach { r =>
      val k = (r.get(0), r.get(1))
      assert(batchByKey.contains(k), s"stream emitted unknown window $k")
      assert(batchByKey(k) == r.toSeq, s"window $k differs: batch=${batchByKey(k)} stream=${r.toSeq}")
    }
    assert(streamed.length >= batch.length - 8,
      s"stream closed too few windows: ${streamed.length} vs batch ${batch.length}")
  }
}
