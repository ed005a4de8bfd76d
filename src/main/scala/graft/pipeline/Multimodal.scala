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
  * corpus scale.
  *
  * AUDIO DECODES FOR REAL on the PCM container path: the JDK ships
  * WAV/AIFF/AU readers (javax.sound.sampled), so `decodeAudioBatch`
  * extracts true format facts and signal features (RMS, peak,
  * zero-crossing rate).
  *
  * VIDEO DECODES FOR REAL on two container paths: Y4M (uncompressed
  * planar YUV — `y4mFrameSamples`) and MJPEG-in-AVI (`aviFrameSamples`:
  * a RIFF chunk walk finds the `LIST movi` frame chunks and the JDK's
  * own JPEG codec decodes each frame — no external library). Remaining
  * out of pure-JVM reach: inter-frame codecs (H.264/VP9/AV1) and
  * compressed audio (MP3/AAC). For video those plug into the
  * [[Multimodal.VideoDecoders]] REGISTRY (`codecFrameSamples` routes by
  * `meta.codec`; register a JNI/ffmpeg-backed [[Multimodal.VideoDecoder]]
  * and every frame flows through the same tested sampling plumbing —
  * spec-driven with a fake compressed codec); for audio `decodeBatch`
  * remains a deterministic byte-histogram stand-in with the same
  * swap-only-the-body contract.
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

  /** Real audio decode result (PCM WAV path): format facts + signal
    * features (RMS energy, peak, zero-crossing rate — the standard cheap
    * audio-quality/speech-detection features). */
  case class AudioFeatures(media_id: Long, decoded: Boolean, sample_rate: Int,
                           channels: Int, n_frames: Long, duration_s: Double,
                           rms: Double, peak: Double, zcr: Double)

  /** REAL audio decode via the JDK's built-in WAV/AIFF/AU readers
    * (javax.sound.sampled — PCM only; compressed codecs like MP3/AAC are
    * not in the JVM and stay behind the stub path). Same resilience
    * contract as images: a corrupt payload yields decoded=false, never a
    * task failure. Samples are folded to mono doubles in [-1, 1]. */
  def decodeAudioBatch(batch: Seq[MediaRow]): Seq[AudioFeatures] =
    batch.map { r =>
      val res =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(Option(r.payload).getOrElse(Array.emptyByteArray)))
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val bytesPerSample = bits / 8
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              || (bits != 16 && bits != 8)) null
          else {
            val bytes = in.readAllBytes()
            val frameBytes = bytesPerSample * ch
            val nFrames = bytes.length / frameBytes
            var sumSq = 0.0; var peak = 0.0; var crossings = 0L
            var prevSign = 0
            var f = 0
            while (f < nFrames) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = f * frameBytes + c * bytesPerSample
                val v =
                  if (bits == 16) {
                    val lo = bytes(off) & 0xff
                    val hi = bytes(off + 1).toInt // WAV PCM16 is little-endian
                    val s = if (fmt.isBigEndian) ((bytes(off).toInt << 8) | (bytes(off + 1) & 0xff))
                            else ((hi << 8) | lo)
                    s.toShort / 32768.0
                  } else bytes(off).toInt / 128.0 // 8-bit here is PCM_SIGNED
                                                  // (AIFF/AU; unsigned 8-bit
                                                  // WAV fails the guard above)
                acc += v
                c += 1
              }
              val mono = acc / ch
              sumSq += mono * mono
              val a = math.abs(mono)
              if (a > peak) peak = a
              val sign = if (mono > 0) 1 else if (mono < 0) -1 else prevSign
              if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
              if (sign != 0) prevSign = sign
              f += 1
            }
            val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames)
            val zcr = if (nFrames <= 1) 0.0 else crossings.toDouble / (nFrames - 1)
            AudioFeatures(r.media_id, decoded = true, fmt.getSampleRate.toInt, ch,
              nFrames.toLong, nFrames.toDouble / fmt.getSampleRate, rms, peak, zcr)
          }
        } catch { case scala.util.control.NonFatal(_) => null }
      if (res == null)
        AudioFeatures(r.media_id, decoded = false, 0, 0, 0L, 0.0, 0.0, 0.0, 0.0)
      else res
    }

  /** Deterministic synthetic WAV payload (16-bit PCM mono, 8 kHz sine):
    * frames = 1000 + (id%5)·500, amplitude = 0.25 + (id%3)·0.05,
    * frequency = 200 + (id%20)·10 Hz. The parameters are simple id
    * arithmetic so a SQL oracle can recompute every FORMAT fact of the
    * decode analytically while the signal features are guarded in-query
    * (rms ≈ amp/√2). Shared by PipelineSpec and the p21 verified query. */
  def synthWav(id: Long): Array[Byte] = {
    val sr = 8000
    val n = (1000 + (id % 5) * 500).toInt
    val amp = 0.25 + (id % 3) * 0.05
    val freq = 200.0 + (id % 20) * 10.0
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (amp * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val Mask63 = (1L << 63) - 1

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The analytic aHash of `synthPng(id)`: ids share a FAMILY (id/4) whose
    * 63-bit base pattern comes from a splitmix64 finalizer; variant id%4
    * flips 0/1/2/8 nested bit positions, so within a family the pairwise
    * Hamming distances are exactly (v0,v1)=1, (v0,v2)=2, (v1,v2)=1 and
    * v3 is ≥6 from everything — three near-dup pairs per family at
    * maxHamming=3, zero across families. Pure id arithmetic, so both a
    * unit test and the m01 in-query guard can pin the REAL decode output
    * bit-for-bit. */
  def imagePattern(id: Long): Long = {
    val f = id / 4
    val v = (id % 4).toInt
    var p = mix64(f) & Mask63
    // degenerate all-dark / all-bright patterns would make the
    // luma-vs-mean threshold meaningless; nudge them (never hit for the
    // verified id range — pinned by the unit test — but kept total)
    if (p == 0L) p = 1L
    if (p == Mask63) p &= ~2L
    val flips = if (v == 3) 8 else v
    var k = 0
    while (k < flips) { p ^= 1L << (((f + 17 * k) % 63).toInt); k += 1 }
    p
  }

  /** Deterministic 64×64 PNG for `id`: an 8×8 grid of uniform 8px cells,
    * cell i bright (220) iff bit i of `imagePattern(id)` — row-major,
    * matching decodeImageBatch's getRGB(i%8, i/8) order. Uniform cells
    * survive the decoder's bilinear 8×8 downscale exactly, so
    * aHash(synthPng(id)) == imagePattern(id) through the REAL codec
    * round-trip. Shared by PipelineSpec and the m01 verified query. */
  def synthPng(id: Long): Array[Byte] = {
    val p = imagePattern(id)
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var py = 0
    while (py < 64) {
      var px = 0
      while (px < 64) {
        val bit = (py / 8) * 8 + (px / 8)
        val luma = if (bit < 63 && ((p >>> bit) & 1L) == 1L) 220 else 30
        img.setRGB(px, py, (luma << 16) | (luma << 8) | luma)
        px += 1
      }
      py += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched per-partition audio decode — same plumbing as images. */
  def audioFeatures(spark: SparkSession, media: DataFrame,
                    batchSize: Int = 64): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height", "meta.codec AS codec")
      .as[(Long, Array[Byte], String, Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, p, k, w, h, c) => MediaRow(id, p, MediaMeta(k, w, h, c)) }
          .grouped(batchSize)
          .flatMap(b => decodeAudioBatch(b.toSeq))
      }
  }

  /** Per-media voice-activity summary from energy-based segmentation. */
  case class VadSummary(media_id: Long, decoded: Boolean, n_segments: Long,
                        active_ms: Long, first_ms: Long, last_ms: Long)

  /** Energy-based voice-activity detection over REAL WAV decode
    * (javax.sound.sampled): mono samples are windowed into
    * `winFrames`-sample frames, a frame is ACTIVE when its RMS clears
    * `threshold`, and consecutive active frames merge into segments —
    * the classic first pass of any speech-data pipeline (silence
    * trimming, utterance splitting, speech-fraction quality gates).
    * Same batched mapPartitions shape and corrupt-payload resilience as
    * the other decoders; per-row state is one payload's samples. */
  def vadBatch(batch: Seq[MediaRow], winFrames: Int = 80,
               threshold: Double = 0.05): Seq[VadSummary] =
    batch.map { r =>
      val res =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(Option(r.payload).getOrElse(Array.emptyByteArray)))
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              || fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) null
          else {
            val bytes = in.readAllBytes()
            val n = bytes.length / 2
            val sr = fmt.getSampleRate.toDouble
            val nWin = n / winFrames
            var seg = 0L; var activeWins = 0L
            var firstWin = -1L; var lastWin = -1L
            var prevActive = false
            var w = 0
            while (w < nWin) {
              var sumSq = 0.0
              var i = 0
              while (i < winFrames) {
                val off = (w * winFrames + i) * 2
                val lo = bytes(off) & 0xff
                val hi = bytes(off + 1).toInt
                val s = (if (fmt.isBigEndian) ((bytes(off).toInt << 8) | (bytes(off + 1) & 0xff))
                         else ((hi << 8) | lo)).toShort / 32768.0
                sumSq += s * s
                i += 1
              }
              val active = math.sqrt(sumSq / winFrames) > threshold
              if (active) {
                activeWins += 1
                if (!prevActive) seg += 1
                if (firstWin < 0) firstWin = w
                lastWin = w
              }
              prevActive = active
              w += 1
            }
            def ms(wins: Long): Long =
              math.round(wins * winFrames * 1000.0 / sr)
            VadSummary(r.media_id, decoded = true, seg, ms(activeWins),
              if (firstWin < 0) -1L else ms(firstWin),
              if (lastWin < 0) -1L else ms(lastWin + 1))
          }
        } catch { case scala.util.control.NonFatal(_) => null }
      if (res == null) VadSummary(r.media_id, decoded = false, 0L, 0L, -1L, -1L)
      else res
    }

  def vadSummaries(spark: SparkSession, media: DataFrame,
                   batchSize: Int = 64, winFrames: Int = 80,
                   threshold: Double = 0.05): Dataset[VadSummary] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height", "meta.codec AS codec")
      .as[(Long, Array[Byte], String, Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, p, k, w, h, c) => MediaRow(id, p, MediaMeta(k, w, h, c)) }
          .grouped(batchSize)
          .flatMap(b => vadBatch(b.toSeq, winFrames, threshold))
      }
  }

  /** Deterministic synthetic "speech" WAV: five 100 ms segments (800
    * frames @ 8 kHz, 16-bit PCM mono); segment s carries a 0.3-amplitude
    * 400 Hz tone when (id + s) is even and silence otherwise. Segment
    * length is a multiple of the 80-frame VAD window and the tone period
    * (400 Hz @ 8 kHz = 20 samples) divides the 80-frame window exactly,
    * so every window holds whole periods and its RMS is analytically
    * 0.3/√2 or 0 — a SQL oracle can recompute every VAD fact from id
    * parity alone. */
  def synthVadWav(id: Long): Array[Byte] = {
    val sr = 8000
    val segFrames = 800
    val nSeg = 5
    val pcm = new Array[Byte](segFrames * nSeg * 2)
    var s = 0
    while (s < nSeg) {
      val active = (id + s) % 2 == 0
      var i = 0
      while (i < segFrames) {
        val idx = s * segFrames + i
        val v = if (active)
          (0.3 * math.sin(2 * math.Pi * 400.0 * idx / sr) * 32767).toInt
        else 0
        pcm(idx * 2) = (v & 0xff).toByte
        pcm(idx * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      s += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, (segFrames * nSeg).toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-frame video sample: container facts + a per-frame statistic.
    * `decoded` mirrors the image/audio resilience contract. */
  case class VideoFrame(media_id: Long, n_frames: Long, frame_idx: Long,
                        mean_byte: Double)

  /** ===== STUB (codec seam) ===== Frame-sampling "decode" over an opaque
    * video payload: NO video codec ships in the JVM, so the container
    * parse is a deterministic raw layout (contiguous `frameBytes`-byte
    * frames, no header) — a real deployment replaces ONLY the slicing
    * below with a JNI/ffmpeg batch call producing the same
    * MediaRow→VideoFrame rows. Everything around the seam is real and
    * oracle-checked: batched partition iteration, every-`stride`-th
    * frame selection (the classic training-data frame-sample step), and
    * the per-frame statistic (mean unsigned byte = the luma-mean
    * stand-in). Truncated trailing bytes (< one frame) are dropped,
    * like a codec dropping a torn final packet. */
  def sampleVideoFramesBatch(batch: Seq[MediaRow], frameBytes: Int,
                             stride: Int): Seq[VideoFrame] =
    batch.flatMap { r =>
      val p = Option(r.payload).getOrElse(Array.emptyByteArray)
      val nFrames = p.length / frameBytes
      (0 until nFrames by stride).map { f =>
        var s = 0L
        var i = 0
        while (i < frameBytes) { s += p(f * frameBytes + i) & 0xff; i += 1 }
        VideoFrame(r.media_id, nFrames.toLong, f.toLong,
          s.toDouble / frameBytes)
      }
    }

  /** Batched per-partition video frame sampling — same plumbing
    * discipline as imageFeatures/audioFeatures: partition iterator →
    * bounded batches → batch decode → flattened frame rows. Output is
    * ∝ sampled frames (corpus_bytes/frameBytes/stride rows), never
    * buffered beyond one batch. */
  def videoFrameSamples(spark: SparkSession, media: DataFrame,
                        frameBytes: Int = 64, stride: Int = 3,
                        batchSize: Int = 64): Dataset[VideoFrame] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height", "meta.codec AS codec")
      .as[(Long, Array[Byte], String, Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, p, k, w, h, c) => MediaRow(id, p, MediaMeta(k, w, h, c)) }
          .grouped(batchSize)
          .flatMap(b => sampleVideoFramesBatch(b.toSeq, frameBytes, stride))
      }
  }

  // ===== Pluggable codec seam (the H.264/VP9/AV1 story) ================
  // No inter-frame codec ships in the JVM and none can honestly be
  // reimplemented here — so the seam is a REGISTRY, not a TODO comment:
  // a deployment registers one decoder per codec tag (JNI/ffmpeg
  // service/hardware decode — anything that turns a payload into frame
  // byte planes), and EVERYTHING else (batched partition iteration,
  // stride sampling, per-frame statistics, the decoded=false resilience
  // contract, partitioning) is the same tested plumbing the built-in
  // containers use. MultimodalSpec drives the seam end to end with a
  // fake run-length "codec", proving a registered decoder's frames flow
  // through identically to the real MJPEG/Y4M paths.

  /** One video codec: payload bytes → per-frame byte planes, stream
    * order. Implementations run on EXECUTORS inside mapPartitions, so
    * they must be serializable and thread-agnostic; a malformed payload
    * should throw — the plumbing converts that to a decoded=false row
    * rather than a task failure. */
  trait VideoDecoder extends Serializable {
    def decodeFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]]
  }

  /** Codec registry. Registration happens on the driver (at session
    * setup); [[codecFrameSamples]] snapshots the registry into its task
    * closure, so executors see exactly the decoders registered when the
    * query was BUILT — no executor-side global state. */
  object VideoDecoders {
    private val reg = scala.collection.concurrent.TrieMap[String, VideoDecoder](
      // built-in containers, re-expressed through the same seam
      "y4m" -> new VideoDecoder {
        def decodeFrames(p: Array[Byte]): IndexedSeq[Array[Byte]] = {
          val (info, offs) = parseY4m(p)
          offs.map(o => java.util.Arrays.copyOfRange(p, o, o + info.ySize))
        }
      },
      "mjpeg-avi" -> new VideoDecoder {
        def decodeFrames(p: Array[Byte]): IndexedSeq[Array[Byte]] =
          parseAviMjpeg(p)._2
      })
    def register(codec: String, d: VideoDecoder): Unit = reg.put(codec, d)
    def registered: Set[String] = reg.keySet.toSet
    private[pipeline] def snapshot: Map[String, VideoDecoder] = reg.toMap
  }

  /** Per-frame sample through the codec registry. */
  case class CodecFrame(media_id: Long, codec: String, decoded: Boolean,
                        n_frames: Long, frame_idx: Long, mean_byte: Double)

  /** Frame sampling routed through [[VideoDecoders]] by `meta.codec`:
    * every `stride`-th decoded frame yields its mean byte (the luma-mean
    * stand-in the built-in paths emit). Unknown codecs and payloads the
    * decoder rejects produce one decoded=false row per media — the
    * image/audio resilience contract — never a task failure. Output is
    * ∝ sampled frames; nothing buffers beyond one decode. */
  def codecFrameSamples(spark: SparkSession, media: DataFrame,
                        stride: Int = 3, batchSize: Int = 64): Dataset[CodecFrame] = {
    import spark.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val decoders = VideoDecoders.snapshot // driver-time snapshot, shipped with the task
    media.selectExpr("media_id", "payload", "meta.codec AS codec")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { case (id, p, codec) =>
          decoders.get(codec) match {
            case None =>
              Seq(CodecFrame(id, codec, decoded = false, 0L, -1L, 0.0))
            case Some(d) =>
              val frames =
                try d.decodeFrames(Option(p).getOrElse(Array.emptyByteArray))
                catch { case scala.util.control.NonFatal(_) => null }
              if (frames == null)
                Seq(CodecFrame(id, codec, decoded = false, 0L, -1L, 0.0))
              else (0 until frames.length by stride).map { f =>
                val fr = frames(f)
                var s = 0L
                var i = 0
                while (i < fr.length) { s += fr(i) & 0xff; i += 1 }
                CodecFrame(id, codec, decoded = true, frames.length.toLong,
                  f.toLong, if (fr.isEmpty) 0.0 else s.toDouble / fr.length)
              }
          }
        })
      }
  }

  // ===== Y4M (YUV4MPEG2) — a REAL video container the JVM can parse =====
  // Y4M is the reference uncompressed interchange format (mjpegtools,
  // ffmpeg's yuv4mpegpipe): a plain-text stream header
  // "YUV4MPEG2 W<w> H<h> F<n>:<d> [I?] [A?] [C<colorspace>]\n" followed
  // by frames, each "FRAME[params]\n" + raw planar YUV bytes. No codec
  // involved — so the container parse here is REAL (magic, geometry,
  // colorspace → plane sizes, per-frame markers), not a stand-in. For a
  // COMPRESSED path see aviFrameSamples (MJPEG-in-AVI, JDK JPEG codec);
  // only inter-frame codecs remain out of pure-JVM reach.

  /** Parsed Y4M geometry: true header fields + derived plane sizes. */
  case class Y4mInfo(width: Int, height: Int, colorspace: String,
                     ySize: Int, frameSize: Int)

  /** Parse a YUV4MPEG2 payload: header fields + the byte offset of each
    * frame's luma plane. Malformed containers fail LOUDLY (require) —
    * a silent partial parse would fabricate frame statistics. */
  private[graft] def parseY4m(p: Array[Byte]): (Y4mInfo, IndexedSeq[Int]) = {
    val nl = p.indexOf('\n'.toByte)
    require(nl > 0, "Y4M: missing stream-header newline")
    val header = new String(p, 0, nl, "US-ASCII")
    val toks = header.split(' ')
    require(toks.head == "YUV4MPEG2", s"Y4M: bad magic '${toks.head}'")
    def param(tag: Char): Option[String] =
      toks.tail.find(t => t.nonEmpty && t.head == tag).map(_.tail)
    val w = param('W').map(_.toInt).getOrElse(
      sys.error("Y4M: missing W param"))
    val h = param('H').map(_.toInt).getOrElse(
      sys.error("Y4M: missing H param"))
    require(w > 0 && h > 0, s"Y4M: bad geometry ${w}x$h")
    val cs = param('C').getOrElse("420jpeg") // spec default is 4:2:0
    val ySize = w * h
    val chromaSize =
      if (cs.startsWith("420")) 2 * ((w + 1) / 2) * ((h + 1) / 2)
      else if (cs.startsWith("422")) 2 * ((w + 1) / 2) * h
      else if (cs.startsWith("444")) 2 * ySize
      else if (cs == "mono") 0
      else sys.error(s"Y4M: unsupported colorspace C$cs")
    val info = Y4mInfo(w, h, cs, ySize, ySize + chromaSize)
    val frameMagic = "FRAME".getBytes("US-ASCII")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var off = nl + 1
    while (off < p.length) {
      require(off + frameMagic.length <= p.length &&
        frameMagic.indices.forall(i => p(off + i) == frameMagic(i)),
        s"Y4M: expected FRAME marker at byte $off")
      var j = off + frameMagic.length
      while (j < p.length && p(j) != '\n'.toByte) j += 1 // frame params
      require(j < p.length, "Y4M: unterminated FRAME header")
      val y0 = j + 1
      require(y0 + info.frameSize <= p.length,
        s"Y4M: truncated frame at byte $y0")
      offs += y0
      off = y0 + info.frameSize
    }
    (info, offs.toIndexedSeq)
  }

  /** Deterministic synthetic Y4M stream: a REAL YUV4MPEG2 container
    * (header + FRAME markers + planar 4:2:0 payload) of 10 + id%7
    * frames whose LUMA byte i of frame f = (id·31 + f·7 + i) mod 256 —
    * pure id arithmetic, so a SQL oracle recomputes every sampled
    * frame's luma statistics analytically while the engine genuinely
    * parses the container. Chroma planes carry distinct arithmetic so a
    * plane-slicing bug (reading U/V as luma) cannot cancel out. */
  def synthY4M(id: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val n = (10 + id % 7).toInt
    val ySize = w * h
    val cSize = 2 * ((w + 1) / 2) * ((h + 1) / 2)
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < n) {
      out.write(frameHdr)
      var i = 0
      while (i < ySize) { out.write(((id * 31 + f * 7 + i) % 256).toInt); i += 1 }
      var c = 0
      while (c < cSize) { out.write(((id * 13 + f * 5 + c) % 256).toInt); c += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Batched per-partition Y4M frame sampling: parse each payload's REAL
    * container structure, slice every `stride`-th frame's luma plane,
    * emit its mean — same plumbing discipline as imageFeatures (partition
    * iterator → bounded batches → flattened rows; output ∝ sampled
    * frames, never buffered beyond one payload's offset table). */
  def y4mFrameSamples(spark: SparkSession, media: DataFrame,
                      stride: Int = 3, batchSize: Int = 64): Dataset[VideoFrame] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { b =>
          b.flatMap { case (id, p) =>
            val (info, yOffs) = parseY4m(p)
            (0 until yOffs.length by stride).map { f =>
              val y0 = yOffs(f)
              var s = 0L
              var i = 0
              while (i < info.ySize) { s += p(y0 + i) & 0xff; i += 1 }
              VideoFrame(id, yOffs.length.toLong, f.toLong,
                s.toDouble / info.ySize)
            }
          }
        }
      }
  }

  // ===== MJPEG-in-AVI — a REAL compressed-video path, pure JVM ========
  // AVI is a RIFF container: "RIFF"<size>"AVI " then chunks, each
  // fourcc(4) + size(4, LE) + data (padded to even). "LIST"<size><type>
  // nests: LIST hdrl carries the avih main header (total frames, WxH),
  // LIST movi carries the frame chunks ("00dc"/"00db" for stream 0).
  // With the MJPG handler every frame chunk is a complete baseline JPEG
  // — which the JDK's own ImageIO codec decodes — so BOTH the container
  // walk and the per-frame decode are real here; only inter-frame
  // codecs (H.264 etc.) remain out of pure-JVM reach.

  /** Parsed AVI facts: header geometry + declared frame count + stream
    * count (from avih dwStreams — video+audio files have ≥2) +
    * `declaredMismatch`, true when a multi-stream file's dwTotalFrames
    * disagrees with the movi frame count (muxers often count interleave
    * units) — carried IN-BAND so a consumer can surface it per payload
    * instead of it vanishing into executor stderr. */
  case class AviInfo(width: Int, height: Int, totalFrames: Int,
                     streams: Int = 1, declaredMismatch: Boolean = false)

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  /** Strict RIFF/AVI walk: validates the magics, reads geometry and the
    * declared frame count from `avih`, and returns every video frame
    * chunk ("00dc"/"00db") payload from `LIST movi` in stream order.
    * Malformed containers fail LOUDLY — a silent partial parse would
    * fabricate frame statistics. */
  private[graft] def parseAviMjpeg(p: Array[Byte]): (AviInfo, IndexedSeq[Array[Byte]]) = {
    require(p.length >= 12 && fourcc(p, 0) == "RIFF",
      "AVI: missing RIFF magic")
    require(fourcc(p, 8) == "AVI ", s"AVI: bad form type '${fourcc(p, 8)}'")
    val riffEnd = math.min(p.length.toLong, 8L + le32(p, 4)).toInt
    var info: Option[AviInfo] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 12
    while (off + 8 <= riffEnd) {
      val cc = fourcc(p, off)
      val sz = le32(p, off + 4)
      require(sz >= 0 && off + 8 + sz <= riffEnd,
        s"AVI: chunk '$cc' at byte $off overruns the container")
      if (cc == "LIST") {
        require(sz >= 4, s"AVI: LIST at byte $off too short for a type")
        val listType = fourcc(p, off + 8)
        val body0 = off + 12
        val bodyEnd = off + 8 + sz
        if (listType == "hdrl") {
          // first subchunk must be avih (56-byte MainAVIHeader)
          require(body0 + 8 <= bodyEnd && fourcc(p, body0) == "avih",
            "AVI: hdrl does not start with avih")
          val ahSz = le32(p, body0 + 4)
          require(ahSz >= 40 && body0 + 8 + ahSz <= bodyEnd,
            "AVI: truncated avih")
          val ah = body0 + 8
          info = Some(AviInfo(le32(p, ah + 32), le32(p, ah + 36),
            le32(p, ah + 16), le32(p, ah + 24)))
        } else if (listType == "movi") {
          // interleaved files wrap frame groups in nested `LIST rec `
          // chunks (one per interleave unit) — recurse through them;
          // any other nested LIST type inside movi is skipped whole
          def walkMovi(start: Int, end: Int): Unit = {
            var o = start
            while (o + 8 <= end) {
              val fcc = fourcc(p, o)
              val fsz = le32(p, o + 4)
              require(fsz >= 0 && o + 8 + fsz <= end,
                s"AVI: movi chunk '$fcc' at byte $o overruns the list")
              if (fcc == "LIST") {
                require(fsz >= 4, s"AVI: LIST at byte $o too short for a type")
                if (fourcc(p, o + 8) == "rec ") walkMovi(o + 12, o + 8 + fsz)
              } else if (fcc == "00dc" || fcc == "00db")
                frames += java.util.Arrays.copyOfRange(p, o + 8, o + 8 + fsz)
              o += 8 + fsz + (fsz & 1) // chunks pad to even
            }
          }
          walkMovi(body0, bodyEnd)
        }
      }
      off += 8 + sz + (sz & 1)
    }
    val i = info.getOrElse(sys.error("AVI: no hdrl/avih header found"))
    // dwTotalFrames is exact only for a lone video stream; with audio
    // interleaved many muxers count interleave units, so the mismatch is
    // advisory there — flagged on AviInfo, not printed (a stderr line per
    // payload per parse is invisible to queries and unbounded at corpus
    // scale). The frames found are all complete chunks either way: the
    // per-chunk bounds checks above stay strict.
    if (i.streams <= 1)
      require(i.totalFrames == frames.length,
        s"AVI: header declares ${i.totalFrames} frames, movi carries ${frames.length}")
    (i.copy(declaredMismatch = i.totalFrames != frames.length),
      frames.toIndexedSeq)
  }

  /** Mean luma of a decoded frame: band 0 directly for grayscale, the
    * BT.601 luma weights over RGB otherwise. */
  private def meanLuma(im: java.awt.image.BufferedImage): Double = {
    val w = im.getWidth; val h = im.getHeight
    require(w > 0 && h > 0, "AVI: decoded frame has zero area")
    var s = 0.0
    if (im.getRaster.getNumBands == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += im.getRaster.getSample(x, y, 0); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
    }
    s / (w.toLong * h)
  }

  /** Batched per-partition MJPEG-in-AVI frame sampling: REAL RIFF walk
    * + REAL ImageIO JPEG decode of every `stride`-th frame, emitting its
    * mean luma — same plumbing discipline as y4mFrameSamples (partition
    * iterator → bounded batches → flattened rows; output ∝ sampled
    * frames, one payload decoded at a time). */
  def aviFrameSamples(spark: SparkSession, media: DataFrame,
                      stride: Int = 2, batchSize: Int = 64): Dataset[VideoFrame] = {
    import spark.implicits._
    media.selectExpr("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { b =>
          b.flatMap { case (id, p) =>
            val (_, frames) = parseAviMjpeg(p)
            (0 until frames.length by stride).map { f =>
              val im = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frames(f)))
              require(im != null, s"AVI: frame $f of media $id did not decode")
              VideoFrame(id, frames.length.toLong, f.toLong, meanLuma(im))
            }
          }
        }
      }
  }

  /** Write a 16×16 uniform-gray baseline JPEG with the JDK encoder. */
  private def grayJpeg(gray: Int, w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.getRaster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic MJPEG-in-AVI container: a REAL RIFF/AVI
    * (hdrl with avih + vids/MJPG strl, movi with one baseline-JPEG
    * "00dc" chunk per frame) of 6 + id%5 frames, frame f a UNIFORM
    * gray g = (id·37 + f·11) mod 236 + 10. Uniform grays round-trip
    * the JDK JPEG codec EXACTLY (DC-only blocks — MultimodalSpec pins
    * all 256 values), so a SQL oracle recomputes every sampled frame's
    * mean luma analytically while the engine genuinely walks the
    * container and decodes the JPEG bytes. */
  def synthAviMjpeg(id: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val n = (6 + id % 5).toInt
    val jpegs = (0 until n).map(f =>
      grayJpeg(((id * 37 + f * 11) % 236 + 10).toInt, w, h))
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(cc.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }
    def list(tp: String, bodies: Seq[Array[Byte]]): Array[Byte] = {
      val inner = bodies.foldLeft(tp.getBytes("US-ASCII"))(_ ++ _)
      chunk("LIST", inner)
    }
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40000).putInt(0).putInt(0).putInt(0) // usec/frame, bps, pad, flags
      b.putInt(n).putInt(0).putInt(1).putInt(0)     // totalFrames, init, streams, bufSize
      b.putInt(w).putInt(h)                         // width, height
      b.array()                                     // 16 reserved bytes stay 0
    }
    val strh = {
      val b = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, init
      b.putInt(1).putInt(25).putInt(0).putInt(n)    // scale, rate, start, length
      b.array()
    }
    val strf = {
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      b.put("MJPG".getBytes("US-ASCII")).putInt(w * h * 3)
      b.array()
    }
    val hdrl = list("hdrl", Seq(chunk("avih", avih),
      list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)))
    val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunk("RIFF", form)
  }

  /** Deterministic synthetic "video" payload: 10 + id%7 contiguous raw
    * `frameBytes`-byte frames, byte i of frame f = (id·31 + f·7 + i)
    * mod 256 — pure id arithmetic, so a SQL oracle recomputes every
    * sampled frame's statistics analytically while the engine genuinely
    * slices them out of the binary payload. Shared by PipelineSpec and
    * the m02 verified query. */
  def synthVideo(id: Long, frameBytes: Int = 64): Array[Byte] = {
    val n = (10 + id % 7).toInt
    val b = new Array[Byte](n * frameBytes)
    var f = 0
    while (f < n) {
      var i = 0
      while (i < frameBytes) {
        b(f * frameBytes + i) = ((id * 31 + f * 7 + i) % 256).toByte
        i += 1
      }
      f += 1
    }
    b
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
