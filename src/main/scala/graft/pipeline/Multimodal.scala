package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * runs as a batched per-partition pipeline (the Scala analog of
  * `mapInPandas` — partition iterator → fixed-size batches → vectorized
  * worker call → flattened rows).
  *
  * IMAGES DECODE FOR REAL: the JDK ships PNG/JPEG/BMP/GIF codecs
  * (javax.imageio, no external libraries), so `decodeImageBatch` reads
  * the payload, extracts true dimensions, resizes to an 8×8 luma grid
  * and emits a 64-dim feature vector + the classic aHash (each cell vs
  * mean) — a 64-bit signature that plugs straight into the banded
  * Hamming join (`Dedup.simhashPairs`) for image near-dup detection at
  * corpus scale. Audio/video codecs are NOT in the JVM; for those kinds
  * `decodeBatch` remains a deterministic byte-histogram stand-in, and a
  * real deployment swaps only that body (JNI/ONNX) over the same batch
  * shape.
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

  /** Real image decode result: true dims, 8×8 luma features, aHash. */
  case class ImageFeatures(media_id: Long, decoded: Boolean, width: Int,
                           height: Int, mean_luma: Double, ahash: Long,
                           features: Array[Float])

  /** REAL image decode via the JDK's built-in codecs (PNG/JPEG/BMP/GIF).
    * Undecodable payloads yield decoded=false rows, never exceptions —
    * at corpus scale a corrupt blob must not kill the task. */
  def decodeImageBatch(batch: Seq[MediaRow]): Seq[ImageFeatures] =
    batch.map { r =>
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(Option(r.payload).getOrElse(Array.emptyByteArray)))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null)
        ImageFeatures(r.media_id, decoded = false, 0, 0, 0.0, 0L, Array.empty[Float])
      else {
        // resize to 8x8 via Graphics2D (area-ish via smooth scaling)
        val small = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, 8, 8, null)
        g.dispose()
        val feats = new Array[Float](64)
        var s = 0.0
        var i = 0
        while (i < 64) {
          val rgb = small.getRGB(i % 8, i / 8)
          val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          feats(i) = luma.toFloat
          s += luma
          i += 1
        }
        val mean = s / 64.0
        var ahash = 0L
        i = 0
        while (i < 64) { if (feats(i) >= mean) ahash |= (1L << i); i += 1 }
        // bit 63 cleared so the signature stays positive, matching the
        // 63-bit SimHash convention simhashPairs' bit-banding assumes
        ahash &= ~(1L << 63)
        ImageFeatures(r.media_id, decoded = true, img.getWidth, img.getHeight,
          mean, ahash, feats)
      }
    }

  /** Batched per-partition image decode — same plumbing discipline as
    * extractFeatures; one task decodes its partition in bounded batches. */
  def imageFeatures(spark: SparkSession, media: DataFrame,
                    batchSize: Int = 64): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height", "meta.codec AS codec")
      .as[(Long, Array[Byte], String, Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, p, k, w, h, c) => MediaRow(id, p, MediaMeta(k, w, h, c)) }
          .grouped(batchSize)
          .flatMap(b => decodeImageBatch(b.toSeq))
      }
  }

  /** Image near-dup pairs: aHash signatures through the SAME banded
    * Hamming bucket join the text SimHash path uses — candidates only
    * form inside 16-bit band buckets, exact for maxHamming ≤ 3. */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sigs = imageFeatures(spark, media)
      .filter(col("decoded"))
      .select(col("media_id").as("id"), col("ahash").as("sig"))
    Dedup.simhashPairs(sigs, maxHamming)
  }

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
