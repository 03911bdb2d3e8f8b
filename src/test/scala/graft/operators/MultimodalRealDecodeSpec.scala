package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real-decode path of the hybrid [[Multimodal.decodeBatch]]: PNG/JPEG
  * bytes encoded in-memory by the JDK itself (no fixture files, no
  * imaging libs beyond `javax.imageio`) are pushed through the SAME
  * Spark plumbing as the catalog query — binary column, typed batched
  * mapPartitions — and must come back with their true pixel dimensions.
  * The synthetic driver corpus (text bytes) never matches an image
  * magic, so the catalog oracle keeps gating the deterministic-fake
  * path; this spec is what pins the real one.
  */
class MultimodalRealDecodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
    out.toByteArray
  }

  test("real PNGs/JPEGs decode to true pixel dims through the Spark stage") {
    import spark.implicits._
    val dims = Seq((7, 13), (640, 2), (1, 1), (223, 224))
    val pngs = dims.zipWithIndex.map { case ((w, h), i) =>
      (i.toLong, "image/png", encode(w, h, "png"))
    }
    val jpeg = (100L, "image/jpeg", encode(33, 44, "jpg"))
    val media = (pngs :+ jpeg).toDF("doc_id", "mime", "payload")
    val rows = Multimodal.decode(media).collect().map(r => r.doc_id -> r).toMap
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val r = rows(i.toLong)
      assert(r.decode_ok, s"png $i failed to decode")
      assert(r.width == w && r.height == h,
        s"png $i: got ${r.width}x${r.height}, want ${w}x$h")
      assert(r.n_frames == 1)
    }
    assert(rows(100L).decode_ok && rows(100L).width == 33 && rows(100L).height == 44)
  }

  test("corrupt PNG (valid magic, truncated body) reports decode_ok=false, not fake dims") {
    import spark.implicits._
    val broken = encode(50, 50, "png").take(20)
    assert(Multimodal.looksLikeRealImage(broken))
    val media = Seq((0L, "image/png", broken)).toDF("doc_id", "mime", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(!r.decode_ok && r.width == 0 && r.height == 0 && r.n_frames == 0)
    assert(r.byte_len == 20)
  }

  test("text bytes never sniff as an image and keep the deterministic fake path") {
    import spark.implicits._
    val txt = "plain document text, the driver corpus shape".getBytes("UTF-8")
    assert(!Multimodal.looksLikeRealImage(txt))
    val media = Seq((1L, "image/jpeg", txt)).toDF("doc_id", "mime", "payload")
    val r = Multimodal.decode(media).collect().head
    val len = txt.length.toLong
    assert(r.decode_ok && r.width == 16 + len % 640 && r.height == 16 + len % 480)
  }

  /** In-memory animated GIF: the JDK's own GIF writer in sequence mode
    * (no fixture files, no native libs) — frame i gets a distinct pixel
    * pattern so per-frame hashes must differ.
    */
  private def encodeAnimatedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { i =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17 + i * 97) & 0xffffff)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  test("animated GIF: real frame count in decode, real pixel hashes in frame sampling") {
    import spark.implicits._
    val gif3 = encodeAnimatedGif(5, 4, 3)
    val gif10 = encodeAnimatedGif(6, 6, 10)
    assert(Multimodal.looksLikeGif(gif3) && Multimodal.looksLikeGif(gif10))
    val media = Seq((0L, "video/mp4", gif3), (1L, "image/gif", gif10))
      .toDF("doc_id", "mime", "payload")
    // decode: n_frames is the REAL animation length, dims are frame 0's
    val dec = Multimodal.decode(media).collect().map(r => r.doc_id -> r).toMap
    assert(dec(0L).decode_ok && dec(0L).n_frames == 3 &&
      dec(0L).width == 5 && dec(0L).height == 4)
    assert(dec(1L).decode_ok && dec(1L).n_frames == 10 &&
      dec(1L).width == 6 && dec(1L).height == 6)
    // frame sampling: <=4 evenly strided REAL frames, hashes from pixels
    val frames = Multimodal.sampleFrames(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(frames(0L).map(f => (f.n_frames, f.frame_idx)).toSeq ==
      Seq((3L, 0L), (3L, 1L), (3L, 2L)), "3 frames, stride 1: sample all")
    assert(frames(1L).map(f => (f.n_frames, f.frame_idx)).toSeq ==
      Seq((10L, 0L), (10L, 2L), (10L, 4L), (10L, 6L)), "10 frames: stride 2")
    // distinct pixel content -> distinct hashes; rerun is deterministic
    assert(frames(0L).map(_.frame_md5).distinct.length == 3)
    assert(frames(1L).map(_.frame_md5).distinct.length == 4)
    val again = Multimodal.sampleFrames(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx).map(_.frame_md5).toSeq).toMap
    assert(again(0L) == frames(0L).map(_.frame_md5).toSeq &&
      again(1L) == frames(1L).map(_.frame_md5).toSeq,
      "frame hashes are deterministic across runs")
    // and the hash IS the pixel hash: recompute frame 0 locally
    val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(gif3))
    val reader = ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val want = Multimodal.frameMd5(reader.read(0))
    reader.dispose(); iis.close()
    assert(frames(0L).head.frame_md5 == want)
  }

  test("corrupt GIF (valid signature, truncated body) yields decode_ok=false and no frames") {
    import spark.implicits._
    val broken = encodeAnimatedGif(5, 4, 3).take(10)
    assert(Multimodal.looksLikeGif(broken))
    val media = Seq((7L, "video/mp4", broken)).toDF("doc_id", "mime", "payload")
    val r = Multimodal.decode(media).collect().head
    assert(!r.decode_ok && r.n_frames == 0 && r.width == 0 && r.height == 0)
    assert(Multimodal.sampleFrames(media).collect().isEmpty,
      "a corrupt GIF must not fall through to the stub frame path")
  }

  test("roundtrip: decode of the JDK's own re-encode is stable (resize-plan input)") {
    import spark.implicits._
    // the aspect-fit plan on a REAL decoded 448x224 image must halve to 224x112
    val media = Seq((9L, "image/png", encode(448, 224, "png")))
      .toDF("doc_id", "mime", "payload")
    val plan = Multimodal.decode(media).toDF()
      .selectExpr("doc_id", "width", "height",
        s"(width * ${Multimodal.Target}) DIV greatest(width, height) AS out_w",
        s"(height * ${Multimodal.Target}) DIV greatest(width, height) AS out_h")
      .collect().head
    assert(plan.getAs[Long]("out_w") == 224L && plan.getAs[Long]("out_h") == 112L)
  }
}
