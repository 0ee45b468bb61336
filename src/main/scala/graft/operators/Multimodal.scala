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
  * The actual byte decoding is a STUB — no image/audio codecs exist in
  * this container — replaced by a deterministic synthesis from the
  * payload bytes (marked below). Everything around it is real and
  * load-bearing: the binary column, the typed schema, the partition
  * iterator shape, and the metadata contract are exactly what a codec
  * plug-in would drop into.
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

  /** STUB decode: deterministic synthesis of what a real decoder would
    * return (dimensions, duration, content checksum). A production build
    * swaps the body for the codec call; the iterator shape, schema and
    * partitioning stay identical. */
  private def decodeOne(m: MediaIn): MediaMeta = {
    val n = m.content.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(m.content).map("%02x".format(_)).mkString
    MediaMeta(m.doc_id, m.modality, n,
      width = 64L + n % 640L,
      height = 64L + (n * 7L) % 480L,
      duration_ms = if (m.modality == "image") 0L else (n * 13L) % 90000L,
      checksum = checksum)
  }

  /** Partition-batched decode: one iterator per partition (codec init
    * would live at the top of the lambda, amortized across the batch). */
  def decode(media: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real build: val codec = Codec.open() here, closed at end)
      it.map(decodeOne)
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
    "q_multimodal_resize" -> (multimodalResize _)
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
        |FROM meta ORDER BY doc_id""".stripMargin
  )
}
