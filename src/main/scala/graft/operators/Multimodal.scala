package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One decoded media asset. */
case class MediaRow(
    doc_id: Long, mime: String, byte_len: Long, content_md5: String,
    width: Long, height: Long, n_frames: Long, decode_ok: Boolean)

/** One sampled video frame (stub content hash). */
case class FrameRow(doc_id: Long, n_frames: Long, frame_idx: Long, frame_md5: String)

/** One decoded audio clip's integer-exact features. */
case class AudioRow(
    doc_id: Long, sample_rate: Long, n_samples: Long, duration_ms: Long,
    peak_abs: Long, sum_sq: Long, zero_crossings: Long, decode_ok: Boolean)

/** One fixed-width stub feature vector (8 dims + squared norm). */
case class FeatureRow(
    doc_id: Long, mime: String,
    f0: Long, f1: Long, f2: Long, f3: Long,
    f4: Long, f5: Long, f6: Long, f7: Long,
    feat_norm_sq: Long)

/** Multimodal-column plumbing: media as opaque binary columns with typed
  * metadata, decoded/feature-extracted via a typed `mapPartitions` stage
  * that processes partitions in fixed-size batches (the shape a real
  * image/audio decoder needs — per-batch amortized model/codec setup).
  *
  * `decodeBatch` is a HYBRID: payloads carrying a real still-image
  * magic number (PNG/JPEG/GIF/BMP) decode for REAL through the JDK's
  * `javax.imageio` — true pixel dimensions, no native libs needed —
  * while all other payloads (the synthetic text-bytes corpus, and any
  * codec the JDK lacks, e.g. video) fall back to a deterministic fake
  * deriving width/height/frame-count from the byte length. The
  * Spark-side plumbing — binary column, schema, partition batching,
  * typed Dataset output — is identical on both paths;
  * [[MultimodalRealDecodeSpec]] drives real in-memory-encoded PNGs
  * through it, and the catalog oracle gates the fake path (the driver
  * corpus is text bytes, which never match an image magic). Swap the
  * fallback for a JNI/ffmpeg call in production.
  *
  * Scale: mapPartitions is narrow (no shuffle); binary payloads stay in
  * the partition where parquet put them. The oracle reproduces only the
  * deterministic metadata arithmetic, which is the point of keeping the
  * stub pure.
  */
object Multimodal {

  val BatchSize = 64

  // pure-memory decode on executors — never spill ImageIO's stream
  // cache to local temp files
  javax.imageio.ImageIO.setUseCache(false)

  /** True iff the payload leads with a magic number the JDK's ImageIO
    * can decode without native libs: PNG, JPEG, GIF, or BMP.
    */
  def looksLikeRealImage(b: Array[Byte]): Boolean =
    (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff) ||
      looksLikeGif(b) ||
      (b.length >= 2 && b(0) == 'B' && b(1) == 'M')

  /** Full GIF87a/GIF89a signature — the one still-image container the
    * JDK reads MULTI-FRAME (animated) without native libs, so GIF
    * payloads get real n_frames and real per-frame hashes (r16 VERDICT
    * task 5) while other video-ish payloads keep the documented stub.
    */
  def looksLikeGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Run `f` over an ImageReader positioned on `bytes`; None when no
    * reader claims the payload or the read throws (corrupt container).
    */
  private def withReader[A](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => A): Option[A] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        r.setInput(iis)
        try Some(f(r))
        catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Deterministic pixel hash of one decoded frame: md5 over
    * (width, height, row-major ARGB ints, big-endian) — pure pixel
    * content, independent of the reader's internal raster layout.
    */
  def frameMd5(img: java.awt.image.BufferedImage): String = {
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val bb = java.nio.ByteBuffer.allocate(8 + px.length * 4)
    bb.putInt(w); bb.putInt(h)
    px.foreach(bb.putInt)
    java.security.MessageDigest.getInstance("MD5")
      .digest(bb.array).map("%02x".format(_)).mkString
  }

  /** Hybrid decoder: real `javax.imageio` decode for real image bytes
    * (a sniffed-but-corrupt image reports `decode_ok = false` with
    * zeroed dims — it must NOT fall through to the fake, or corruption
    * would masquerade as success); deterministic fake for everything
    * else.
    */
  def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaRow] =
    batch.map { case (id, mime, bytes) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val len = bytes.length.toLong
      if (looksLikeGif(bytes)) {
        // GIF decodes through the reader API so n_frames is the REAL
        // animated frame count (getNumImages(true) walks the stream)
        withReader(bytes)(r =>
          (r.getWidth(0).toLong, r.getHeight(0).toLong,
            r.getNumImages(true).toLong)) match {
          case Some((w, h, n)) => MediaRow(id, mime, len, md5,
            width = w, height = h, n_frames = n, decode_ok = true)
          case None => MediaRow(id, mime, len, md5,
            width = 0, height = 0, n_frames = 0, decode_ok = false)
        }
      } else if (looksLikeRealImage(bytes)) {
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(i) => MediaRow(id, mime, len, md5,
            width = i.getWidth.toLong, height = i.getHeight.toLong,
            n_frames = 1, decode_ok = true)
          case None => MediaRow(id, mime, len, md5,
            width = 0, height = 0, n_frames = 0, decode_ok = false)
        }
      } else MediaRow(
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

  // ---- frame sampling (video): one-to-many typed fan-out ----

  /** Sample ≤4 evenly-strided frames per video asset. GIF payloads take
    * the REAL path (r16 VERDICT task 5): the JDK reader walks the
    * animation, n_frames is the true frame count, and each sampled
    * frame's hash is [[frameMd5]] of its DECODED PIXELS — a corrupt
    * GIF contributes no frame rows (mirroring decode_ok = false). All
    * other payloads keep the documented stub (md5(payload ++ "#idx"));
    * the plumbing is identical on both paths — a batched mapPartitions
    * that fans one asset row out to N frame rows with no shuffle
    * (frames land in the asset's partition, which is what a real
    * ffmpeg frame-grab stage needs for locality). The catalog corpus
    * is text bytes, which never carry the GIF signature, so the
    * DuckDB oracle keeps gating the stub arithmetic.
    */
  def sampleFramesBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[FrameRow] =
    batch.flatMap { case (id, mime, bytes) =>
      if (looksLikeGif(bytes)) {
        withReader(bytes) { r =>
          val nFrames = r.getNumImages(true).toLong
          val stride = math.max(nFrames / 4, 1L)
          (0 until 4)
            .map(_ * stride)
            .filter(_ < nFrames)
            .map(idx => FrameRow(id, nFrames, idx, frameMd5(r.read(idx.toInt))))
        }.getOrElse(Nil)
      } else if (mime != "video/mp4") Nil
      else {
        val nFrames = 1 + bytes.length.toLong / 100
        val stride = math.max(nFrames / 4, 1L)
        (0 until 4)
          .map(_ * stride)
          .filter(_ < nFrames)
          .map { idx =>
            val h = java.security.MessageDigest.getInstance("MD5")
              .digest(bytes ++ s"#$idx".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            FrameRow(id, nFrames, idx, h)
          }
      }
    }

  def sampleFrames(media: DataFrame): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "mime", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(sampleFramesBatch))
  }

  private def framesOracle(d: SqlDialect): String = s"""
WITH v AS (SELECT doc_id, text,
                  1 + CAST(octet_length(encode(text)) AS BIGINT) // 100 AS n_frames
           FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
vs AS (SELECT doc_id, text, n_frames,
              CASE WHEN n_frames // 4 > 1 THEN n_frames // 4 ELSE 1 END AS stride
       FROM v),
f AS (${d.series("doc_id, text, n_frames, stride", "4", "j", "vs")})
SELECT doc_id, n_frames, (j - 1) * stride AS frame_idx,
       md5(text || '#' || CAST((j - 1) * stride AS STRING)) AS frame_md5
FROM f
WHERE (j - 1) * stride < n_frames
ORDER BY doc_id, frame_idx"""

  val qFrames = Q(
    "q_multimodal_frames",
    (spark, dir) => sampleFrames(mediaOf(spark, dir))
      .orderBy("doc_id", "frame_idx").toDF(),
    Some(framesOracle(DuckSql)))

  // ---- feature extraction: fixed-width stub embedding ----

  /** STUB feature extractor: 8 values from the payload's md5 nibbles
    * (charset-proof — both engines hash the same bytes) plus their
    * squared norm. Real plumbing: same batched typed mapPartitions as
    * the decoder; swap the body for an ONNX/JNI encoder in production
    * and the schema, batching, and partitioning stay identical.
    */
  def extractFeaturesBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[FeatureRow] =
    batch.map { case (id, mime, bytes) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val f = (0 until 8).map(i => "0123456789abcdef".indexOf(hex(i)).toLong)
      FeatureRow(id, mime, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7),
        f.map(x => x * x).sum)
    }

  def extractFeatures(media: DataFrame): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "mime", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(extractFeaturesBatch))
  }

  private def featuresOracle(d: SqlDialect): String = {
    val fs = (1 to 8).map { i =>
      s"(${d.strpos("'0123456789abcdef'", s"substr(md5(text), $i, 1)")} - 1)"
    }
    s"""
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       ${fs.zipWithIndex.map { case (f, i) => s"CAST($f AS BIGINT) AS f$i" }.mkString(", ")},
       CAST(${fs.map(f => s"$f * $f").mkString(" + ")} AS BIGINT) AS feat_norm_sq
FROM documents
ORDER BY doc_id"""
  }

  val qFeatures = Q(
    "q_multimodal_features",
    (spark, dir) => extractFeatures(mediaOf(spark, dir)).orderBy("doc_id").toDF(),
    Some(featuresOracle(DuckSql)))

  // ---- resize planning: aspect-preserving fit + letterbox pads ----

  /** Resize-to-224 planning over the decoded metadata: aspect-preserving
    * output dims via integer cross-multiplication (`w·224/max(w,h)` —
    * never float scale factors, whose rounding is library-specific) and
    * the letterbox padding that centers the result. The pixel resample
    * itself would live in the decode stub's batch stage; the PLAN —
    * what every image pipeline precomputes to size buffers and batch
    * uniformly — is pure integer arithmetic both engines reproduce.
    * Narrow projection over the decode output; no shuffle.
    */
  val Target = 224L

  val qResize = Q(
    "q_multimodal_resize",
    (spark, dir) => {
      Multimodal.decode(mediaOf(spark, dir)).toDF()
        .selectExpr("doc_id", "width", "height",
          s"greatest(width, height) >= $Target AS downscale",
          s"(width * $Target) DIV greatest(width, height) AS out_w",
          s"(height * $Target) DIV greatest(width, height) AS out_h")
        .selectExpr("doc_id", "width", "height", "downscale", "out_w", "out_h",
          s"($Target - out_w) DIV 2 AS pad_x",
          s"($Target - out_h) DIV 2 AS pad_y")
        .orderBy("doc_id")
    },
    Some(s"""
WITH m AS (SELECT doc_id,
                  CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
                  CAST(16 + octet_length(encode(text)) % 480 AS BIGINT) AS height
           FROM documents),
p AS (SELECT doc_id, width, height,
             greatest(width, height) >= $Target AS downscale,
             (width * $Target) // greatest(width, height) AS out_w,
             (height * $Target) // greatest(width, height) AS out_h
      FROM m)
SELECT doc_id, width, height, downscale, out_w, out_h,
       ($Target - out_w) // 2 AS pad_x,
       ($Target - out_h) // 2 AS pad_y
FROM p
ORDER BY doc_id"""))

  // ---- audio: REAL WAV PCM decode via the JDK (r18 VERDICT task 7) ----

  /** Audio fixture parameters: 8 kHz mono PCM16. The synthesized clip
    * for doc d has `64 + n_chars % 256` samples with
    * `s(i) = ((d + i) % 7 − 3) · 3000` — a closed form BOTH sides
    * share: the Spark path renders it into real RIFF/WAVE bytes and
    * re-reads them through `javax.sound.sampled.AudioSystem` (true
    * header parse, true PCM frame decode — the audio twin of the
    * image family's `javax.imageio` path), while the DuckDB oracle
    * restates the closed form over a generated series. Any drift in
    * the synth, the WAV framing, or the decode shows up as an oracle
    * hash mismatch.
    */
  val AudioRate = 8000

  /** Deterministic RIFF/WAVE PCM16LE mono clip for (doc_id, n_chars). */
  def wavBytes(docId: Long, nChars: Long): Array[Byte] = {
    val n = (64 + (nChars % 256)).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)                 // PCM, mono
    bb.putInt(AudioRate); bb.putInt(AudioRate * 2) // sample rate, byte rate
    bb.putShort(2); bb.putShort(16)                // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((docId + i) % 7 - 3) * 3000).toShort)
      i += 1
    }
    bb.array
  }

  def synthWavBatch(batch: Seq[(Long, Long)]): Seq[(Long, Array[Byte])] =
    batch.map { case (id, nChars) => (id, wavBytes(id, nChars)) }

  /** REAL decode: header + format via `AudioSystem`, features from the
    * decoded PCM frames. Integer-exact per the [[Q]] determinism
    * contract: peak |s|, Σs² (BIGINT — ≤ 2³¹ samples of ±2¹⁵ fit with
    * headroom), sign-change count (0 counts as non-negative), duration
    * in integer ms. Anything the JDK can't decode as PCM16LE mono —
    * corrupt header, unexpected channel count or width — reports
    * `decode_ok = false` with zeroed features, never a fake (the image
    * decoder's corruption rule).
    */
  def decodeAudioBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioRow] =
    batch.map { case (id, bytes) =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val ok = fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian && fmt.getSampleRate > 0
          if (!ok) AudioRow(id, 0, 0, 0, 0, 0, 0, decode_ok = false)
          else {
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            var peak = 0L; var sumSq = 0L; var zc = 0L
            var prevNeg = false
            var i = 0
            while (i < n) {
              val s = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort.toLong
              val a = math.abs(s)
              if (a > peak) peak = a
              sumSq += s * s
              val neg = s < 0
              if (i > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            val rate = fmt.getSampleRate.toLong
            AudioRow(id, rate, n, n * 1000L / rate, peak, sumSq, zc, decode_ok = true)
          }
        } finally ais.close()
      } catch {
        case _: Exception => AudioRow(id, 0, 0, 0, 0, 0, 0, decode_ok = false)
      }
    }

  /** The decode stage over a (doc_id, payload binary) frame — same
    * batched, shuffle-free typed mapPartitions as the image decoder.
    */
  def decodeAudio(media: DataFrame): Dataset[AudioRow] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeAudioBatch))
  }

  private def audioOracle(d: SqlDialect): String = s"""
WITH a AS (SELECT doc_id, 64 + n_chars % 256 AS n_samples
           FROM documents WHERE CAST(doc_id % 3 AS INT) = 1),
s AS (SELECT doc_id, j,
             ((doc_id + j - 1) % 7 - 3) * 3000 AS smp,
             ((doc_id + j - 2) % 7 - 3) * 3000 AS sprev
      FROM (${d.series("doc_id, n_samples", "n_samples", "j", "a")}) x)
SELECT doc_id,
       CAST($AudioRate AS BIGINT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(${d.idiv("count(*) * 1000", AudioRate.toString)} AS BIGINT) AS duration_ms,
       CAST(max(abs(smp)) AS BIGINT) AS peak_abs,
       CAST(sum(smp * smp) AS BIGINT) AS sum_sq,
       CAST(sum(CASE WHEN j >= 2 AND ((smp < 0) <> (sprev < 0)) THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       count(*) > 0 AS decode_ok
FROM s
GROUP BY doc_id
ORDER BY doc_id"""

  val qAudio = Q(
    "q_multimodal_audio",
    (spark, dir) => {
      import spark.implicits._
      val clips = Tables.documents(spark, dir)
        .filter("CAST(doc_id % 3 AS INT) = 1")
        .select("doc_id", "n_chars").as[(Long, Long)]
        .mapPartitions(_.grouped(BatchSize).flatMap(synthWavBatch))
        .toDF("doc_id", "payload")
      decodeAudio(clips).orderBy("doc_id").toDF()
    },
    Some(audioOracle(DuckSql)))

  val all: Seq[Q] = Seq(qDecode, qFrames, qFeatures, qResize, qAudio)
}
