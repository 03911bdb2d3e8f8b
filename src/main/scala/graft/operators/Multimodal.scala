package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One decoded media asset. */
case class MediaRow(
    doc_id: Long, mime: String, byte_len: Long, content_md5: String,
    width: Long, height: Long, n_frames: Long, decode_ok: Boolean)

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted via a typed `mapPartitions` stage
  * that processes partitions in fixed-size batches (the shape a real
  * image/audio decoder needs — per-batch amortized model/codec setup).
  *
  * The container has no imaging libs, so `decodeBatch` is a STUB: a
  * deterministic fake decoder deriving width/height/frame-count from the
  * byte length. The Spark-side plumbing — binary column, schema,
  * partition batching, typed Dataset output — is real and tested; swap
  * `decodeBatch` for a JNI/ffmpeg call in production.
  *
  * Scale: mapPartitions is narrow (no shuffle); binary payloads stay in
  * the partition where parquet put them. The oracle reproduces only the
  * deterministic metadata arithmetic, which is the point of keeping the
  * stub pure.
  */
object Multimodal {

  val BatchSize = 64

  /** STUB decoder — deterministic fake in lieu of an imaging lib. */
  def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaRow] =
    batch.map { case (id, mime, bytes) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val len = bytes.length.toLong
      MediaRow(
        doc_id = id, mime = mime, byte_len = len, content_md5 = md5,
        width = 16 + len % 640, height = 16 + len % 480,
        n_frames = if (mime == "video/mp4") 1 + len / 100 else 1,
        decode_ok = len > 0)
    }

  /** documents → media table with an opaque binary payload column. */
  def mediaOf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime",
      "CAST(text AS BINARY) AS payload")

  /** The decode stage: typed, batched, shuffle-free. */
  def decode(media: DataFrame): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media
      .select("doc_id", "mime", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  private def oracle: String = """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST(16 + octet_length(encode(text)) % 480 AS BIGINT) AS height,
       CAST(CASE WHEN CAST(doc_id % 3 AS INT) = 2 THEN 1 + octet_length(encode(text)) // 100 ELSE 1 END AS BIGINT) AS n_frames,
       octet_length(encode(text)) > 0 AS decode_ok
FROM documents
ORDER BY doc_id"""

  val qDecode = Q(
    "q_multimodal_decode",
    (spark, dir) => decode(mediaOf(spark, dir)).orderBy("doc_id").toDF(),
    Some(oracle)
  )

  val all: Seq[Q] = Seq(qDecode)
}
