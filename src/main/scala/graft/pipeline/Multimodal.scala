package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs as a batched per-partition pipeline (the Scala analog of
  * `mapInPandas` — partition iterator → fixed-size batches → vectorized
  * worker call → flattened rows).
  *
  * The DECODE STEP IS A STUB: real image/audio codecs are not in this
  * container, so `decodeBatch` computes a deterministic fake feature
  * vector (byte histogram moments). Everything around it — schema,
  * partitioning, batch shape, typed Dataset plumbing — is real and
  * tested; swapping in a JNI/ONNX decoder changes only the stub body.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int, codec: String)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  /** Wrap an arbitrary id+binary DataFrame into the canonical media
    * schema (metadata defaults derived from the payload). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(lit(kind).as("kind"), lit(0).as("width"), lit(0).as("height"),
        lit("raw").as("codec")).as("meta"))

  /** ===== STUB ===== deterministic fake decoder: 8 byte-histogram-moment
    * "features" per payload. A real deployment replaces ONLY this body
    * with the actual codec/model call over the same batch shape. */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
      val feats = new Array[Float](8)
      var i = 0
      while (i < bytes.length) {
        feats(bytes(i) & 7) += 1f
        i += 1
      }
      val n = math.max(1, bytes.length).toFloat
      MediaFeatures(r.media_id, bytes.length.toLong, feats.map(_ / n))
    }

  /** Batched per-partition feature extraction. `batchSize` bounds worker
    * memory exactly like maxRecordsPerBatch does for Arrow batches. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height", "meta.codec AS codec")
      .as[(Long, Array[Byte], String, Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, p, k, w, h, c) => MediaRow(id, p, MediaMeta(k, w, h, c)) }
          .grouped(batchSize)
          .flatMap(b => decodeBatch(b.toSeq))
      }
  }
}
