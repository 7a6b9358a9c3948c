package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Spark-side multimodal plumbing: schema, batch shape, null handling,
  * determinism of the stubbed decode, frame sampling fan-out. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def mediaDf = {
    import spark.implicits._
    (0L until 20L).map(i =>
        (i, if (i == 13) null else s"payload-bytes-of-doc-$i".getBytes("UTF-8"), "image"))
      .toDF("id", "blob", "kind")
  }

  // ------------------------------------------- real container headers

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
  /** Canonical 44-byte WAV header + silence: `frames` sample frames of
    * 16-bit stereo at 8 kHz (blockAlign 4). */
  private def wavBytes(frames: Int): Array[Byte] = {
    val dataLen = frames * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(8000).putInt(8000 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  test("MediaHeaders parses real ImageIO-generated PNG and JPEG dimensions") {
    val png = MediaHeaders.parse(pngBytes(37, 23))
    assert(png.contains(MediaHeaders.Header("png", 37, 23, 1)))
    val jpg = MediaHeaders.parse(jpegBytes(64, 48))
    assert(jpg.contains(MediaHeaders.Header("jpeg", 64, 48, 1)))
  }

  test("MediaHeaders parses real ImageIO-generated GIF dimensions") {
    val img = new java.awt.image.BufferedImage(21, 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    assert(MediaHeaders.parse(out.toByteArray).contains(MediaHeaders.Header("gif", 21, 13, 1)))
    assert(MediaHeaders.parse("GIF8".getBytes("US-ASCII")).isEmpty)
  }

  test("MediaHeaders counts animated GIF frames via the image-descriptor block walk") {
    // Hand-built GIF89a: global color table (2 entries), then per frame a
    // 0x21/0xF9 graphic-control extension + 0x2C image descriptor with a
    // one-byte LZW data sub-block; trailer 0x3B. The walk must skip the
    // color tables and sub-block chains and count exactly the 0x2C blocks.
    def frame(lct: Boolean): Array[Byte] = {
      val gce = Array[Byte](0x21, 0xf9.toByte, 0x04, 0x00, 0x0a, 0x00, 0x00, 0x00)
      val packed: Byte = if (lct) 0x80.toByte else 0x00
      val desc = Array[Byte](0x2c, 0, 0, 0, 0, 4, 0, 3, 0, packed)
      val lctBytes = if (lct) Array.fill[Byte](6)(0x33) else Array.empty[Byte]
      val data = Array[Byte](0x02, 0x02, 0x4c, 0x01, 0x00) // min-code, 2-byte sub-block, terminator
      gce ++ desc ++ lctBytes ++ data
    }
    val header = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 3, 0, 0x80.toByte, 0x00, 0x00) ++ // LSD w=4 h=3, GCT flag
      Array.fill[Byte](6)(0x11) // global color table (2 entries)
    val twoFrames = header ++ frame(lct = false) ++ frame(lct = true) :+ 0x3b.toByte
    assert(MediaHeaders.parse(twoFrames).contains(MediaHeaders.Header("gif", 4, 3, 2)))
    // truncated mid-stream: keep frames counted so far, never fail the header
    assert(MediaHeaders.parse(twoFrames.dropRight(25)).map(_.nFrames).exists(_ >= 1))
  }

  test("MediaHeaders parses WAV sample frames and APNG frame counts") {
    assert(MediaHeaders.parse(wavBytes(12345))
      .contains(MediaHeaders.Header("wav", 8000, 2, 12345)))
    // splice an acTL chunk (8 frames) between IHDR and IDAT of a real PNG
    val png = pngBytes(5, 5)
    val ihdrEnd = 8 + 8 + 13 + 4 // sig + IHDR header + data + crc
    val acTL = java.nio.ByteBuffer.allocate(20)
      .putInt(8).put("acTL".getBytes("US-ASCII")).putInt(8).putInt(0).putInt(0).array()
    val apng = png.take(ihdrEnd) ++ acTL ++ png.drop(ihdrEnd)
    assert(MediaHeaders.parse(apng).contains(MediaHeaders.Header("png", 5, 5, 8)))
  }

  test("MediaHeaders rejects junk, truncated, and non-media payloads") {
    assert(MediaHeaders.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parse(Array[Byte]()).isEmpty)
    assert(MediaHeaders.parse(pngBytes(9, 9).take(15)).isEmpty)
    assert(MediaHeaders.parse(jpegBytes(9, 9).take(3)).isEmpty)
    assert(MediaHeaders.parse(wavBytes(10).take(20)).isEmpty)
    assert(MediaHeaders.parse(null).isEmpty)
  }

  test("hostile RIFF chunk sizes above Int.MaxValue terminate the walks (no hang)") {
    // a declared chunk size of 0xFFFFFFFF used to truncate negative via
    // .toInt, making the walker's advance ≤ 0 — the task then hung
    // forever, which no try/catch can turn into a skipped row
    def hostile(form: String): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56).put(form.getBytes("US-ASCII"))
      bb.put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFFF) // hostile size
      bb.array()
    }
    assert(MediaHeaders.parse(hostile("WAVE")).isEmpty)
    assert(MediaHeaders.parse(hostile("AVI ")).isEmpty)
    assert(MediaCodec.aviFrameRanges(hostile("AVI ")).isEmpty)
    // hostile size INSIDE the hdrl LIST (the avih walk's inner loop)
    val inner = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56).put("AVI ".getBytes("US-ASCII"))
      bb.put("LIST".getBytes("US-ASCII")).putInt(40).put("hdrl".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFFF)
      bb.array()
    }
    assert(MediaHeaders.parse(inner).isEmpty)
    // and inside a movi LIST for the frame-range walk
    val moviHostile = {
      val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56).put("AVI ".getBytes("US-ASCII"))
      bb.put("LIST".getBytes("US-ASCII")).putInt(40).put("movi".getBytes("US-ASCII"))
      bb.put("00dc".getBytes("US-ASCII")).putInt(0xFFFFFFFF)
      bb.array()
    }
    assert(MediaCodec.aviFrameRanges(moviHostile).isEmpty)
  }

  // ------------------------------------------- real pixel/sample decode

  /** 2×2 ARGB PNG with four known opaque pixels (R, G, B, white). */
  private val goldenArgb = Array(0xffff0000, 0xff00ff00, 0xff0000ff, 0xffffffff)
  private def goldenPng: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, 2, 2, goldenArgb, 0, 2)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
  /** Animated 2-frame GIF: frame 0 solid red, frame 1 solid blue. */
  private def goldenGif2: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(0xffff0000, 0xff0000ff).foreach { c =>
      val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 3, 2, Array.fill(6)(c), 0, 3)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    out.toByteArray
  }
  /** 8-sample-frame mono 16-bit WAV with known sample values. */
  private val goldenSamples = Array[Short](0, 16384, -16384, 32767, -32768, 8192, -8192, 0)
  private def goldenWav: Array[Byte] = {
    val dataLen = goldenSamples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    goldenSamples.foreach(bb.putShort)
    bb.array()
  }

  /** 2-frame MJPEG AVI: frame 0 solid 0x808080, frame 1 solid 0x303030
    * (JPEG is lossy — solid grays compress near-exactly). Minimal but
    * well-formed RIFF: hdrl(avih + strl(strh/strf 'MJPG')) + movi with
    * two '00dc' JPEG chunks. */
  private def solidJpeg(c: Int, w: Int = 4, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, Array.fill(w * h)(c), 0, w)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }
  private def goldenAvi: Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val frames = Seq(solidJpeg(0xff808080), solidJpeg(0xff303030))
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + data.length + (data.length & 1)).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }
    def list(tpe: String, children: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + children.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + children.length)
        .put(tpe.getBytes("US-ASCII")).put(children)
      bb.array()
    }
    val avih = { // 56-byte MainAVIHeader: totalFrames @16, width @32, height @36
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40000).putInt(0).putInt(0).putInt(0)
      bb.putInt(frames.length).putInt(0).putInt(1).putInt(0)
      bb.putInt(4).putInt(4)
      bb.array()
    }
    val strh = { // stream header: fccType 'vids', handler 'MJPG'
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      bb.array()
    }
    val strf = { // BITMAPINFOHEADER with biCompression 'MJPG'
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(4).putInt(4).putShort(1).putShort(24)
      bb.put("MJPG".getBytes("US-ASCII"))
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    bb.array()
  }

  test("MediaHeaders parses AVI dimensions and total frames from the avih header") {
    assert(MediaHeaders.parse(goldenAvi).contains(MediaHeaders.Header("avi", 4, 4, 2)))
    // truncation stays exception-total
    assert(MediaHeaders.parse(goldenAvi.take(20)).isEmpty)
    assert(MediaCodec.aviFrameRanges(goldenAvi.take(40)).isEmpty)
  }

  test("MediaCodec decodes MJPEG-in-AVI frames as real JPEG pixels") {
    val avi = goldenAvi
    assert(MediaCodec.aviFrameRanges(avi).length == 2)
    val fs = MediaCodec.videoFrames(avi, Seq(0, 1))
    assert(fs.keySet == Set(0, 1))
    def assertSolid(p: MediaCodec.ImagePixels, expected: Int): Unit = {
      assert(p.width == 4 && p.height == 4)
      p.argb.foreach { v =>
        Seq((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
          .foreach(c => assert(math.abs(c - expected) <= 2, s"pixel $c vs $expected"))
      }
    }
    assertSolid(fs(0), 0x80)
    assertSolid(fs(1), 0x30)
    // decode() computes REAL frame-0 features (not the stub)
    val mf = Multimodal.decode(9L, avi, "video")
    assert(mf.meta.width == 4 && mf.meta.height == 4 && mf.meta.nFrames == 2)
    assert(mf.features.toSeq == Multimodal.imageFeatures(fs(0)).toSeq)
  }

  test("sampleFrames hashes REAL per-frame pixels for MJPEG AVI video") {
    import spark.implicits._
    val media = Seq((7L, goldenAvi, "video"))
      .toDF("doc_id", "payload", "media_kind")
    val rows = Multimodal.sampleFrames(spark, media, everyNth = 1)
      .orderBy("frame_index").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((7L, 0), (7L, 1)))
    val shas = rows.map(_.getString(2))
    assert(shas(0) != shas(1), "distinct frames must hash differently")
    // real-pixel hashes, not the contentSha stub fallback
    val contentSha16 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(goldenAvi).map("%02x".format(_)).mkString.take(16)
    assert(!shas.exists(_.startsWith(contentSha16)), "must hash frame pixels, not the payload")
  }

  test("MediaCodec decodes golden 2x2 PNG to the exact expected ARGB pixels") {
    val p = MediaCodec.imageFrame(goldenPng).get
    assert(p.width == 2 && p.height == 2)
    assert(p.argb.toSeq == goldenArgb.toSeq)
    // header stats cross-check: container header agrees with decoded image
    val h = MediaHeaders.parse(goldenPng).get
    assert((h.width, h.height, h.nFrames) == (p.width, p.height, 1))
  }

  test("MediaCodec decodes both frames of a 2-frame GIF to exact solid colors") {
    val gif = goldenGif2
    val f0 = MediaCodec.imageFrame(gif, 0).get
    val f1 = MediaCodec.imageFrame(gif, 1).get
    assert(f0.width == 3 && f0.height == 2)
    assert(f0.argb.forall(_ == 0xffff0000), "frame 0 is solid red")
    assert(f1.argb.forall(_ == 0xff0000ff), "frame 1 is solid blue")
    // header block-walk, JDK reader, and batch API all agree on 2 frames
    assert(MediaHeaders.parse(gif).map(_.nFrames).contains(2))
    assert(MediaCodec.imageFrameCount(gif).contains(2))
    assert(MediaCodec.imageFrames(gif, Seq(0, 1)).keySet == Set(0, 1))
  }

  test("MediaCodec decodes a solid-gray JPEG to near-exact pixels (lossy codec tolerance)") {
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 4, 4, Array.fill(16)(0xff808080), 0, 4)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val p = MediaCodec.imageFrame(out.toByteArray).get
    assert(p.width == 4 && p.height == 4)
    p.argb.foreach { v =>
      Seq((v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff).foreach(c => assert(math.abs(c - 0x80) <= 2))
    }
  }

  test("MediaCodec decodes golden WAV to the exact expected normalized samples") {
    val a = MediaCodec.audioSamples(goldenWav).get
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == goldenSamples.map(_ / 32768.0f).toSeq)
    // header cross-check: RIFF probe agrees with the decoded stream
    val h = MediaHeaders.parse(goldenWav).get
    assert((h.width, h.height, h.nFrames) == (a.sampleRate, a.channels, goldenSamples.length))
  }

  test("MediaCodec decodes BMP and MediaHeaders parses its dimensions") {
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 7, 5, Array.fill(35)(0xff112233), 0, 7)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val bytes = out.toByteArray
    assert(MediaHeaders.parse(bytes).contains(MediaHeaders.Header("bmp", 7, 5, 1)))
    val p = MediaCodec.imageFrame(bytes).get
    assert(p.width == 7 && p.height == 5 && p.argb.forall(_ == 0xff112233))
  }

  test("MediaCodec is exception-total on malformed payloads") {
    assert(MediaCodec.imageFrame("junk".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.imageFrame(goldenPng.take(30)).isEmpty) // header ok, body corrupt
    assert(MediaCodec.imageFrame(null).isEmpty)
    assert(MediaCodec.audioSamples("junk".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.audioSamples(null).isEmpty)
    assert(MediaCodec.imageFrames("junk".getBytes("UTF-8"), Seq(0)).isEmpty)
  }

  test("decodeAndFeaturize computes features from REAL pixels/samples for recognized containers") {
    import spark.implicits._
    val rows = Seq((1L, goldenPng, "image"), (2L, goldenWav, "audio"))
      .toDF("id", "blob", "kind")
    val feats = Multimodal.decodeAndFeaturize(spark,
        rows.select($"id".as("doc_id"), $"blob".as("payload"), $"kind".as("media_kind")))
      .collect().map(f => f.meta.docId -> f).toMap
    // PNG: mean R over (255,0,0,255) = 510/4/255 = 0.5; same for G and B
    val img = feats(1L)
    assert(img.meta.width == 2 && img.meta.height == 2)
    assert(math.abs(img.features(0) - 0.5f) < 1e-6)
    assert(math.abs(img.features(1) - 0.5f) < 1e-6)
    assert(math.abs(img.features(2) - 0.5f) < 1e-6)
    assert(img.features(6) == 0.5f) // aspect of a square
    // features must equal a direct recompute from the decoded pixels (no stub)
    val direct = Multimodal.imageFeatures(MediaCodec.imageFrame(goldenPng).get)
    assert(img.features.toSeq == direct.toSeq)
    // WAV: RMS/peak/zcr of the known samples
    val aud = feats(2L)
    val s = goldenSamples.map(_ / 32768.0)
    val rms = math.sqrt(s.map(v => v * v).sum / s.length).toFloat
    assert(math.abs(aud.features(0) - rms) < 1e-6)
    assert(aud.features(2) == 1.0f) // peak hits -32768
    val directA = Multimodal.audioFeatures(MediaCodec.audioSamples(goldenWav).get)
    assert(aud.features.toSeq == directA.toSeq)
  }

  test("sampleFrames hashes REAL per-frame pixels for decodable animated payloads") {
    import spark.implicits._
    val m = Seq((1L, goldenGif2, "image")).toDF("id", "blob", "kind")
    val frames = Multimodal.sampleFrames(spark,
        Multimodal.asMedia(m, "id", "blob", "image"), everyNth = 1)
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(frames.keySet == Set(0, 1))
    // red frame and blue frame hash differently — the sha is over pixels,
    // not over the shared container bytes
    assert(frames(0).takeWhile(_ != ':') != frames(1).takeWhile(_ != ':'))
    assert(frames(0).endsWith(":0") && frames(1).endsWith(":1"))
  }

  test("GIF block walk stops at truncation instead of phantom-counting frames") {
    // 1-frame GIF whose LZW data sub-block claims 10 bytes but the payload
    // ends after 2, and the severed tail byte is 0x2C — a desynced walk
    // would count it as a second image descriptor.
    val header = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 3, 0, 0x00, 0x00, 0x00) // LSD, no global color table
    val desc = Array[Byte](0x2c, 0, 0, 0, 0, 4, 0, 3, 0, 0x00)
    val truncated = header ++ desc ++ Array[Byte](0x02, 0x0a, 0x2c, 0x11)
    assert(MediaHeaders.parse(truncated).map(_.nFrames).contains(1))
  }

  test("decodeAndFeaturize reports REAL dims for recognized containers, stub dims otherwise") {
    import spark.implicits._
    val rows = Seq(
      (1L, pngBytes(37, 23), "image"),
      (2L, jpegBytes(64, 48), "image"),
      (3L, wavBytes(4321), "audio"),
      (4L, "not-a-container".getBytes("UTF-8"), "image"))
      .toDF("id", "blob", "kind")
    val feats = Multimodal.decodeAndFeaturize(spark,
        Multimodal.asMedia(rows, "id", "blob", "image"))
      .collect().map(f => f.meta.docId -> f.meta).toMap
    assert(feats(1L).width == 37 && feats(1L).height == 23 && feats(1L).nFrames == 1)
    assert(feats(2L).width == 64 && feats(2L).height == 48)
    assert(feats(3L).width == 8000 && feats(3L).height == 2 && feats(3L).nFrames == 4321)
    assert(feats(4L).width >= 16 && feats(4L).nFrames >= 1) // sha-derived stub path
  }

  test("asMedia normalizes to the engine media schema") {
    val m = Multimodal.asMedia(mediaDf, "id", "blob", "image")
    assert(m.schema.fieldNames.toSeq == Seq("doc_id", "payload", "media_kind"))
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.count() == 20)
  }

  test("decodeAndFeaturize: per-partition batched, null payloads dropped, deterministic") {
    val m = Multimodal.asMedia(mediaDf, "id", "blob", "image")
    val feats = Multimodal.decodeAndFeaturize(spark, m, targetPartitions = 3).collect()
    assert(feats.length == 19, "null payload (doc 13) dropped")
    assert(feats.forall(_.features.length == Multimodal.FeatureDim))
    assert(feats.forall(f => f.features.forall(v => v >= 0f && v <= 1f)))
    assert(feats.forall(f => f.meta.width >= 16 && f.meta.nFrames >= 1))
    // determinism: same payload -> same features across runs
    val again = Multimodal.decodeAndFeaturize(spark, m).collect()
    assert(feats.sortBy(_.meta.docId).map(_.features.toSeq).toSeq ==
      again.sortBy(_.meta.docId).map(_.features.toSeq).toSeq)
  }

  test("featureTable composes with brute-force cosine ANN (end-to-end media→similarity)") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.queries.LlmQueries.registerFunctions(spark)
    val feats = Multimodal.featureTable(spark, Multimodal.asMedia(mediaDf, "id", "blob", "image"))
      .select(col("doc_id").as("vec_id"),
        expr("transform(features, x -> cast(x AS double))").as("e"))
    feats.createOrReplaceTempView("media_vecs")
    // same two-phase top-k shape as q25, over decoded media features
    val top = spark.sql(
      """WITH vn AS (SELECT vec_id, e, sqrt(dot_d(e, e)) AS nrm FROM media_vecs),
        |q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM vn WHERE vec_id % 7 = 0),
        |sims AS (SELECT /*+ BROADCAST(q) */ q.qid, vn.vec_id,
        |                dot_d(qe, e) / (qnrm * nrm) AS sim
        |         FROM q JOIN vn ON vn.vec_id <> q.qid),
        |ranked AS (SELECT qid, vec_id, sim,
        |                  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |           FROM sims)
        |SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3""".stripMargin).collect()
    val qids = Set(0L, 7L, 14L) // doc 13 is the null payload; 19 docs survive decode
    assert(top.map(_.getLong(0)).toSet == qids)
    assert(top.length == qids.size * 3)
    assert(top.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
  }

  test("featureTable flattens metadata + features for downstream ANN") {
    val t = Multimodal.featureTable(spark, Multimodal.asMedia(mediaDf, "id", "blob", "image"))
    assert(t.schema.fieldNames.toSeq == Seq("doc_id", "payload_bytes", "content_sha",
      "media_kind", "width", "height", "n_frames", "features"))
    val row = t.filter("doc_id = 0").head()
    assert(row.getAs[String]("content_sha").length == 64)
    assert(row.getAs[Long]("payload_bytes") == "payload-bytes-of-doc-0".length)
  }

  test("sampleFrames emits every Nth frame per document") {
    val m = Multimodal.asMedia(mediaDf, "id", "blob", "video")
    val frames = Multimodal.sampleFrames(spark, m, everyNth = 4)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Multimodal.decodeAndFeaturize(spark, m).collect()
      .map(f => f.meta.docId -> ((f.meta.nFrames + 3) / 4).toLong).toMap
    assert(byDoc == expect)
    val idx = frames.filter("doc_id = 0").select("frame_index")
      .collect().map(_.getInt(0)).sorted
    assert(idx.zipWithIndex.forall { case (v, i) => v == i * 4 })
  }
}
