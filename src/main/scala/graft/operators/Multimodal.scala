package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: opaque `binary` payload columns + typed metadata, with
  * decode / feature-extraction / frame-sampling as **partition-batched
  * typed transforms** (`Dataset.mapPartitions`) — the Scala analog of
  * arrow-batched UDFs: one iterator per partition, so a real decoder
  * would amortize codec init across the batch instead of paying it per
  * row.
  *
  * IMAGE and AUDIO run REAL codecs (JDK javax.imageio / javax.sound.
  * sampled — see [[imagePipeline]]/[[audioPipeline]]): synthesize genuine
  * PNG/WAV bytes, decode them back, resize / featurize, all oracle-exact.
  * Only VIDEO decoding remains a deterministic stub (no video codec in
  * this container — marked below); around it the binary column, typed
  * schema, partition iterator shape, and metadata contract are exactly
  * what the codec plug-in drops into.
  *
  * Scale: payloads stay opaque bytes end-to-end (no driver collect, no
  * string round-trip); decode is a narrow map — at 100 TB the only plan
  * nodes are scan → mapPartitions → write, and column pruning drops
  * payloads for metadata-only queries.
  */
object Multimodal {

  /** Input record: binary payload + modality tag. */
  final case class MediaIn(doc_id: Long, modality: String, content: Array[Byte])

  /** Decoded metadata record (what a codec emits per payload). */
  final case class MediaMeta(doc_id: Long, modality: String, n_bytes: Long,
    width: Long, height: Long, duration_ms: Long, checksum: String)

  /** Extracted feature record (what a featurizer emits per payload). */
  final case class MediaFeatures(doc_id: Long, modality: String,
    byte_sum: Long, byte_mean: Double, n_frames: Long)

  /** Documents → binary media records: text bytes play the payload,
    * modality cycles image/audio/video. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaIn] = {
    import s.implicits._
    documents(s, d)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("content"))
      .as[MediaIn]
  }

  /** What a codec reports for one payload. */
  final case class MediaDims(width: Long, height: Long, durationMs: Long)

  /** Pluggable per-modality codec (the media twin of [[Fetch.Transport]]):
    * `probe` inspects the payload bytes and reports dimensions/duration.
    * Record-level decode failures throw — at the operator layer they'd
    * surface in-band exactly like Fetch's error taxonomy. Implementations
    * must serialize (registered codecs ride the mapPartitions closure);
    * keep any native handle `@transient lazy` like
    * [[Fetch.HttpTransport]]'s client. */
  trait MediaCodec extends Serializable {
    def probe(content: Array[Byte]): MediaDims
  }

  /** Default codec: deterministic synthesis of what a real decoder would
    * return, as analytic functions of the payload length — the
    * oracle-able fake. `still` = no time axis (images). */
  final class SyntheticCodec(still: Boolean) extends MediaCodec {
    override def probe(content: Array[Byte]): MediaDims = {
      val n = content.length.toLong
      MediaDims(64L + n % 640L, 64L + (n * 7L) % 480L,
        if (still) 0L else (n * 13L) % 90000L)
    }
  }

  /** REAL image codec over the seam (javax.imageio): the registration a
    * production image corpus uses — the full decode→resize→featurize path
    * it enables is exercised by [[imagePipeline]]. */
  object JdkImageCodec extends MediaCodec {
    override def probe(content: Array[Byte]): MediaDims = {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) throw new java.io.IOException("undecodable image payload")
      MediaDims(img.getWidth.toLong, img.getHeight.toLong, 0L)
    }
  }

  /** REAL audio codec over the seam (javax.sound.sampled WAV/AIFF). */
  object JdkAudioCodec extends MediaCodec {
    override def probe(content: Array[Byte]): MediaDims = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try MediaDims(0L, 0L,
        ais.getFrameLength * 1000L / ais.getFormat.getSampleRate.toLong)
      finally ais.close()
    }
  }

  /** The registry: modality tag → codec. Video's default is the synthetic
    * codec because no video codec ships in this container — but it is now
    * a REGISTRATION, not a hardcoded branch: a production build calls
    * `Multimodal.use("video", FfmpegCodec)` and the decode operator below
    * is untouched. */
  @volatile private var codecs: Map[String, MediaCodec] = defaultCodecs
  private def defaultCodecs: Map[String, MediaCodec] = Map(
    "image" -> new SyntheticCodec(still = true),
    "audio" -> new SyntheticCodec(still = false),
    "video" -> new SyntheticCodec(still = false))
  def use(modality: String, codec: MediaCodec): Unit =
    codecs = codecs + (modality -> codec)
  def resetCodecs(): Unit = codecs = defaultCodecs

  /** Partition-batched decode through the codec registry: one iterator per
    * partition (a stateful codec amortizes its init across the batch via
    * its own `@transient lazy` state). The registry snapshot is captured at
    * PLAN time — a mid-job `use(...)` cannot split a run between codecs. */
  def decode(media: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    val reg = codecs
    media.mapPartitions { it =>
      it.map { m =>
        val codec = reg.getOrElse(m.modality,
          throw new IllegalArgumentException(s"no codec registered for '${m.modality}'"))
        val dims = codec.probe(m.content)
        val md = java.security.MessageDigest.getInstance("MD5")
        MediaMeta(m.doc_id, m.modality, m.content.length.toLong,
          dims.width, dims.height, dims.durationMs,
          md.digest(m.content).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Partition-batched feature extraction + frame sampling: byte-level
    * stats (STUB for an embedding model) and a stride-100 frame count. */
  def features(media: Dataset[MediaIn]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.content.length.toLong
        var sum = 0L
        var i = 0
        while (i < m.content.length) { sum += m.content(i) & 0xff; i += 1 }
        MediaFeatures(m.doc_id, m.modality, sum,
          byte_mean = sum.toDouble / n,
          n_frames = math.max(1L, n / 100L))
      }
    }
  }

  /** Resize plan record: target box 224, aspect preserved (integer math). */
  final case class MediaResize(doc_id: Long, modality: String, width: Long,
    height: Long, out_w: Long, out_h: Long)

  /** Resize planning over decoded metadata — the parameter computation is
    * real (aspect-preserving fit into a 224 box, integer arithmetic); the
    * pixel work would live in the same partition-batched iterator as
    * [[decode]]. */
  def resizePlan(meta: Dataset[MediaMeta]): Dataset[MediaResize] = {
    import meta.sparkSession.implicits._
    meta.mapPartitions(_.map { m =>
      val mx = math.max(m.width, m.height)
      MediaResize(m.doc_id, m.modality, m.width, m.height,
        out_w = m.width * 224L / mx, out_h = m.height * 224L / mx)
    })
  }

  // ------------------------------------------------------- real codecs
  // The JDK ships real image (javax.imageio: PNG/JPEG/BMP/GIF) and audio
  // (javax.sound.sampled: WAV/AIFF) codecs, so those two modalities run
  // the REAL decode → transform → featurize path below; only video still
  // has no in-container codec and keeps the deterministic stub above.
  // Payload bytes are synthesized in-engine (a real PNG / real WAV whose
  // decoded properties are analytic functions of doc_id), so the DuckDB
  // oracle checks the full codec round trip exactly.

  /** Real image pipeline output: decoded dims, aspect-fit resize dims,
    * mean channel values over the RESIZED pixels. */
  final case class ImageOut(doc_id: Long, width: Long, height: Long,
    out_w: Long, out_h: Long, mean_r: Double, mean_g: Double, mean_b: Double)

  /** Synthesize a real PNG (solid color, dims from doc_id) → decode with
    * ImageIO → aspect-preserving resize into a 224 box with Graphics2D →
    * per-channel means over the resized pixels. Every stage is the real
    * codec; solid fill makes the means exact under any interpolation. */
  def imagePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // widen: the whole encode→decode→resize runs in the stage that reads
    // the (single-row-group) fixture scan — one task without the floor
    val out = graft.Tables.widen(documents(s, d).select(col("doc_id")))
      .as[Long].mapPartitions { it =>
      // codec instances are JVM-static (ImageIO registry) — init amortized.
      // Default ImageIO streams are DISK-cached (a temp file per encode/
      // decode!) — keep them in memory.
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = (16 + id % 48).toInt
        val h = (16 + (id * 7) % 48).toInt
        val rgb = ((id % 256) << 16 | ((id * 3) % 256) << 8 | ((id * 7) % 256)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gf = img.createGraphics()
        gf.setColor(new java.awt.Color(rgb))
        gf.fillRect(0, 0, w, h)
        gf.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        // REAL decode of the bytes we just minted
        val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        val (dw, dh) = (dec.getWidth, dec.getHeight)
        val mx = math.max(dw, dh)
        val (ow, oh) = (dw * 224 / mx, dh * 224 / mx)
        val resized = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = resized.createGraphics()
        g2.drawImage(dec, 0, 0, ow, oh, null)
        g2.dispose()
        // bulk pixel grab — per-pixel getRGB pays a color-model call each
        val px = resized.getRGB(0, 0, ow, oh, null, 0, ow)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val n = px.length.toDouble
        ImageOut(id, dw, dh, ow, oh, sr / n, sg / n, sb / n)
      }
    }
    out.toDF().orderBy(col("doc_id"))
  }

  /** Real audio pipeline output: frame count, rate, derived duration, RMS
    * amplitude of the decoded PCM. */
  final case class AudioOut(doc_id: Long, n_frames: Long, sample_rate_hz: Long,
    duration_ms: Long, rms: Double)

  /** Synthesize a real WAV (16-bit PCM mono square wave, frame count and
    * amplitude from doc_id) → decode with javax.sound.sampled → frame/rate
    * metadata + RMS over decoded samples. A square wave's RMS is exactly
    * its amplitude, so the oracle is analytic. */
  def audioPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // JDK provider lock BYPASSED, still NOT widened: AudioSystem.write /
    // .getAudioInputStream route every call through a synchronized
    // JDK-global provider lookup (JDK13Services.getProviders), so 32
    // concurrent tasks serialized on that monitor and ran SLOWER than
    // one (r20 measured 1.8 s single-task → 3.0-3.8 s widened). Each
    // task now loads the SPI codec instances once per partition via
    // ServiceLoader (no shared monitor) and calls the real
    // WaveFileWriter/WaveFileReader directly — identical bytes and
    // semantics (AudioSystem itself just iterates these providers).
    // Measured r21 at sf0.1/local[32]: the bypass alone is 1.16 → 0.92 s
    // warm, but widening REMAINED a loss even with it (0.92 → ~1.9 s) —
    // something below the SPI surface still serializes concurrent
    // encode/decode — so the scan stays at its natural partitioning;
    // re-test widening if the JDK's sound stack ever drops its locks.
    val out = documents(s, d).select(col("doc_id"))
      .as[Long].mapPartitions { it =>
      import javax.sound.sampled._
      import scala.jdk.CollectionConverters._
      val writers = java.util.ServiceLoader
        .load(classOf[spi.AudioFileWriter]).iterator().asScala.toList
      val wavWriter = writers
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
        .getOrElse(throw new IllegalStateException(
          "no WAVE AudioFileWriter SPI on this JVM"))
      val readers = java.util.ServiceLoader
        .load(classOf[spi.AudioFileReader]).iterator().asScala.toList
      def openWav(bytes: Array[Byte]): AudioInputStream =
        readers.iterator.flatMap { r =>
          try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
          catch { case _: UnsupportedAudioFileException => None }
        }.nextOption().getOrElse(throw new IllegalStateException(
          "no AudioFileReader SPI accepted the WAV header"))
      it.map { id =>
        val rate = 8000
        val nFrames = (800 + id % 800).toInt
        val amp = (1000 + id % 9000).toInt
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val s16 = if (i % 2 == 0) amp else -amp
          pcm(2 * i) = (s16 & 0xff).toByte
          pcm(2 * i + 1) = ((s16 >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        wavWriter.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val wav = bos.toByteArray
        // REAL decode of the bytes we just minted
        val ais = openWav(wav)
        val frames = ais.getFrameLength
        val hz = ais.getFormat.getSampleRate.toLong
        val decoded = ais.readAllBytes()
        var sumSq = 0.0
        var j = 0
        while (j < decoded.length) {
          val s16 = ((decoded(j) & 0xff) | (decoded(j + 1) << 8)).toShort.toDouble
          sumSq += s16 * s16
          j += 2
        }
        AudioOut(id, frames, hz, frames * 1000L / hz, math.sqrt(sumSq / frames))
      }
    }
    out.toDF().orderBy(col("doc_id"))
  }

  def multimodalDecode(s: SparkSession, d: String): DataFrame =
    decode(mediaTable(s, d)).toDF().orderBy(col("doc_id"))

  def multimodalResize(s: SparkSession, d: String): DataFrame =
    resizePlan(decode(mediaTable(s, d))).toDF().orderBy(col("doc_id"))

  def multimodalFeatures(s: SparkSession, d: String): DataFrame =
    features(mediaTable(s, d)).toDF().orderBy(col("doc_id"))

  // --------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_multimodal_resize" -> (multimodalResize _),
    "q_image_pipeline" -> (imagePipeline _),
    "q_audio_pipeline" -> (audioPipeline _)
  )

  /** Oracles re-derive the deterministic stub arithmetic in SQL — the
    * payload is the document text's bytes (ASCII corpus, so octet math
    * equals char math in DuckDB). */
  val oracle: Map[String, String] = Map(
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + length(text) % 640 AS BIGINT) AS width,
        |  CAST(64 + (length(text) * 7) % 480 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0
        |       ELSE (length(text) * 13) % 90000 END AS BIGINT) AS duration_ms,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_features" ->
      """SELECT doc_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |  CAST(byte_sum AS BIGINT) AS byte_sum,
        |  CAST(byte_sum AS DOUBLE) / length(text) AS byte_mean,
        |  CAST(greatest(1, length(text) // 100) AS BIGINT) AS n_frames
        |FROM (
        |  SELECT doc_id, text,
        |    list_sum(list_transform(range(1, len(text) + 1),
        |      i -> ord(substr(text, i, 1)))) AS byte_sum
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_multimodal_resize" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |    CAST(64 + length(text) % 640 AS BIGINT) AS width,
        |    CAST(64 + (length(text) * 7) % 480 AS BIGINT) AS height
        |  FROM documents)
        |SELECT doc_id, modality, width, height,
        |  width * 224 // greatest(width, height) AS out_w,
        |  height * 224 // greatest(width, height) AS out_h
        |FROM meta ORDER BY doc_id""".stripMargin,

    // the PNG round trip is lossless and the fill is solid, so decoded
    // dims and post-resize channel means are analytic in doc_id
    "q_image_pipeline" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(16 + doc_id % 48 AS BIGINT) AS width,
        |    CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS height
        |  FROM documents)
        |SELECT doc_id, width, height,
        |  width * 224 // greatest(width, height) AS out_w,
        |  height * 224 // greatest(width, height) AS out_h,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_r,
        |  CAST((doc_id * 3) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_b
        |FROM dims ORDER BY doc_id""".stripMargin,

    // 16-bit PCM is lossless and a square wave's RMS equals its amplitude
    "q_audio_pipeline" ->
      """SELECT doc_id,
        |  CAST(800 + doc_id % 800 AS BIGINT) AS n_frames,
        |  CAST(8000 AS BIGINT) AS sample_rate_hz,
        |  (800 + doc_id % 800) * 1000 // 8000 AS duration_ms,
        |  CAST(1000 + doc_id % 9000 AS DOUBLE) AS rms
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
