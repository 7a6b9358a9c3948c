package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) ride through the
  * engine as opaque `binary` payloads plus typed metadata — the shape the
  * reference sink moves media in (bytes pass-through,
  * `ByteRecordWriterProvider.java:17-42`) — and decode / feature
  * extraction runs batched per partition. Decode is REAL for the
  * containers the JDK ships codecs for: `javax.imageio.ImageIO` decodes
  * PNG/JPEG/GIF/BMP pixels, `javax.sound.sampled.AudioSystem` decodes
  * WAV PCM samples, and MJPEG-in-AVI video decodes frame-by-frame (each
  * frame is a standalone JPEG at a RIFF chunk offset — [[MediaCodec]]);
  * only payloads no JDK codec can decode (codec-compressed video:
  * H.264/VP9/AV1 bitstreams) fall back to a deterministic sha-derived
  * stub (marked STUB below — that boundary is where a video codec /
  * ONNX session would bind per-partition).
  *
  * Scale design: decode is the expensive map stage, so the pattern is
  *  - keep payloads in `binary` columns (no base64 inflation),
  *  - `repartition(n)` only to right-size decode tasks (payloads are
  *    large; a partition should hold ~128 MB of payload, not ~128 MB of
  *    rows),
  *  - run the codec via `mapPartitions` so per-partition init (model
  *    load, codec context) amortizes across the batch — the same shape
  *    `mapInPandas` gives Python pipelines,
  *  - emit fixed-width feature vectors + metadata, never the raw pixels.
  */
/** Pure-JVM media CONTAINER header parsing — PNG IHDR (+ APNG acTL frame
  * count), JPEG SOFn, GIF logical screen + frame walk, BMP BITMAPINFOHEADER,
  * and WAV RIFF fmt/data chunks. These are public, stable byte layouts;
  * header probing stays codec-free so metadata queries (q31 shape) never
  * pay pixel-decode cost. Full pixel/sample decode lives in
  * [[MediaCodec]]. */
object MediaHeaders {

  /** `width`/`height` are pixels for images; for WAV audio `width`
    * carries the sample rate and `height` the channel count (the two
    * discriminative dims of an audio stream). `nFrames` is 1 for still
    * images, the acTL frame count for animated PNG, the image-descriptor
    * count for GIF, and the sample-frame count (data bytes / block
    * align) for WAV. */
  final case class Header(format: String, width: Int, height: Int, nFrames: Int)

  def parse(b: Array[Byte]): Option[Header] =
    if (b == null) None
    else png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(bmp(b)).orElse(wav(b)).orElse(avi(b))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** PNG: 8-byte signature, IHDR first chunk (width/height big-endian at
    * 16/20); frame count from the APNG acTL chunk when present. Chunk
    * CRCs are not verified — this is a header probe, not an integrity
    * check. */
  private def png(b: Array[Byte]): Option[Header] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !b.take(8).sameElements(sig) || ascii(b, 12, 4) != "IHDR") return None
    var frames = 1
    var pos = 8
    var scanning = true
    while (scanning && pos + 8 <= b.length) {
      val clen = be32(b, pos).toLong & 0xffffffffL
      val ctype = ascii(b, pos + 4, 4)
      if (ctype == "acTL" && pos + 12 <= b.length) { frames = math.max(1, be32(b, pos + 8)); scanning = false }
      else if (ctype == "IDAT" || ctype == "IEND") scanning = false // acTL must precede IDAT
      else pos += 8 + clen.toInt + 4
    }
    Some(Header("png", be32(b, 16), be32(b, 20), frames))
  }

  /** JPEG: walk FF-prefixed segments from SOI to the first SOFn
    * (C0-CF except the non-frame C4/C8/CC); height/width are big-endian
    * at offsets 5/7 into the SOF segment. */
  private def jpeg(b: Array[Byte]): Option[Header] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
      val m = b(i + 1) & 0xff
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      else {
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 9 > b.length) return None
          return Some(Header("jpeg", be16(b, i + 7), be16(b, i + 5), 1))
        }
        val len = be16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height, little-endian 16-bit at
    * offsets 6/8 right after the signature. Frame count = number of 0x2C
    * image descriptors found by walking the block stream (0x21 extension
    * blocks are label + data sub-blocks; each sub-block is a length byte
    * followed by that many bytes, terminated by a 0 length byte; image
    * descriptors carry an optional local color table, then LZW min-code
    * byte, then the same sub-block chain). A truncated payload STOPS the
    * walk (a sub-block overrunning the buffer means any further bytes are
    * mid-LZW data, so reinterpreting them as block introducers could
    * phantom-count frames) and reports the frames counted so far (min 1)
    * rather than failing the header. */
  private def gif(b: Array[Byte]): Option[Header] = {
    if (b.length < 10) return None
    val sig = ascii(b, 0, 6)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var frames = 0
    if (b.length >= 13) {
      var pos = 13 // 6 sig + 7 logical screen descriptor
      if ((b(10) & 0x80) != 0) pos += 3 * (1 << ((b(10) & 7) + 1)) // global color table
      // Returns false when the chain is truncated — the walk must stop
      // then, because pos would land inside LZW data otherwise.
      def skipSubBlocks(): Boolean = {
        if (pos >= b.length) return false // truncated before the length byte
        var sz = b(pos) & 0xff
        while (sz != 0) {
          if (pos + 1 + sz >= b.length) return false // sub-block (or its successor's length byte) overruns
          pos += 1 + sz
          sz = b(pos) & 0xff
        }
        pos += 1 // 0x00 terminator
        true
      }
      var walking = true
      while (walking && pos < b.length) {
        (b(pos) & 0xff) match {
          case 0x2c => // image descriptor: 10 bytes incl. introducer
            frames += 1
            if (pos + 10 > b.length) walking = false
            else {
              val packed = b(pos + 9) & 0xff
              pos += 10
              if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1)) // local color table
              pos += 1 // LZW minimum code size
              walking = skipSubBlocks()
            }
          case 0x21 => // extension: introducer + label, then sub-blocks
            pos += 2
            walking = skipSubBlocks()
          case 0x3b => walking = false // trailer
          case _    => walking = false // desynced: keep what we counted
        }
      }
    }
    Some(Header("gif", le16(b, 6), le16(b, 8), math.max(1, frames)))
  }

  /** BMP: "BM" signature; BITMAPINFOHEADER width/height little-endian at
    * 18/22 (height may be negative for top-down rows — dimension is the
    * magnitude). */
  private def bmp(b: Array[Byte]): Option[Header] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    Some(Header("bmp", le32(b, 18), math.abs(le32(b, 22)), 1))
  }

  /** WAV: RIFF/WAVE container; channels + sample rate + block align from
    * the fmt chunk, sample-frame count = data chunk bytes / block align.
    * Chunks are word-aligned (odd sizes pad one byte). */
  private def wav(b: Array[Byte]): Option[Header] = {
    if (b.length < 36 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return None
    var pos = 12
    var channels = 0; var sampleRate = 0; var blockAlign = 0; var dataLen = -1L
    while (pos + 8 <= b.length) {
      val id = ascii(b, pos, 4)
      val sz = le32(b, pos + 4).toLong & 0xffffffffL
      if (id == "fmt " && pos + 8 + 16 <= b.length) {
        channels = le16(b, pos + 10); sampleRate = le32(b, pos + 12); blockAlign = le16(b, pos + 20)
      } else if (id == "data") dataLen = sz
      // word-aligned advance computed in Long: a hostile chunk size
      // above Int.MaxValue would truncate negative via .toInt and stall
      // the walk forever (try/catch can't catch non-termination); a
      // size past the buffer just ends the walk — corrupt = skipped row
      pos = math.min(pos.toLong + 8L + sz + (sz & 1L), b.length.toLong).toInt
    }
    if (blockAlign <= 0 || dataLen < 0) None
    else Some(Header("wav", sampleRate, channels, (dataLen / blockAlign).toInt))
  }

  /** AVI: RIFF/'AVI ' container; width/height/totalFrames from the
    * 'avih' main header (offsets 32/36/16 into its data) inside the
    * 'hdrl' LIST. Chunks are word-aligned like every RIFF form. */
  private def avi(b: Array[Byte]): Option[Header] = {
    if (b.length < 24 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "AVI ") return None
    var pos = 12
    while (pos + 12 <= b.length) {
      val id = ascii(b, pos, 4)
      val sz = le32(b, pos + 4).toLong & 0xffffffffL
      if (id == "LIST" && ascii(b, pos + 8, 4) == "hdrl") {
        var c = pos + 12
        val end = math.min(b.length.toLong, pos + 8L + sz).toInt
        while (c + 8 <= end) {
          val cid = ascii(b, c, 4)
          val csz = le32(b, c + 4).toLong & 0xffffffffL
          if (cid == "avih" && c + 8 + 40 <= b.length)
            return Some(Header("avi", le32(b, c + 8 + 32), le32(b, c + 8 + 36),
              math.max(1, le32(b, c + 8 + 16))))
          // Long advance — see wav(): hostile 32-bit sizes must not
          // truncate negative and stall the walk
          c = math.min(c.toLong + 8L + csz + (csz & 1L), end.toLong).toInt
        }
        return None
      }
      pos = math.min(pos.toLong + 8L + sz + (sz & 1L), b.length.toLong).toInt
    }
    None
  }
}

/** REAL pixel/sample decode on pure JDK codecs — `java.desktop` ships
  * `javax.imageio.ImageIO` (PNG/JPEG/GIF/BMP, headless-safe) and
  * `javax.sound.sampled.AudioSystem` (WAV PCM). Every method is
  * exception-total: malformed bytes return None/empty, never throw, so a
  * corrupt payload in a 100 TB scan costs one skipped row, not a task
  * retry storm. */
object MediaCodec {
  System.setProperty("java.awt.headless", "true")

  /** ARGB pixels of one decoded frame, row-major. */
  final case class ImagePixels(width: Int, height: Int, argb: Array[Int])

  /** Interleaved PCM samples normalized to [-1, 1]. */
  final case class AudioPcm(sampleRate: Int, channels: Int, samples: Array[Float])

  private def withReader[A](payload: Array[Byte])(f: javax.imageio.ImageReader => A): Option[A] = {
    if (payload == null) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, false, true)
          Some(f(reader))
        } finally reader.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None } finally iis.close()
  }

  private def toPixels(img: java.awt.image.BufferedImage): ImagePixels = {
    val w = img.getWidth; val h = img.getHeight
    ImagePixels(w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** Decode frame `idx` (0-based) of an image payload to ARGB pixels. */
  def imageFrame(payload: Array[Byte], idx: Int = 0): Option[ImagePixels] =
    withReader(payload)(r => toPixels(r.read(idx)))

  /** Decode several frames of one payload through a single reader — the
    * per-document codec-context reuse `sampleFrames` needs. Missing /
    * undecodable indices are simply absent from the result. */
  def imageFrames(payload: Array[Byte], indices: Seq[Int]): Map[Int, ImagePixels] =
    withReader(payload) { r =>
      indices.flatMap { i =>
        try Some(i -> toPixels(r.read(i)))
        catch { case scala.util.control.NonFatal(_) => None }
      }.toMap
    }.getOrElse(Map.empty)

  /** Frame count as the JDK reader sees it (exhaustive search). */
  def imageFrameCount(payload: Array[Byte]): Option[Int] =
    withReader(payload)(_.getNumImages(true)).filter(_ > 0)

  /** Byte ranges of the frame chunks (`##dc`/`##db`) inside an AVI
    * 'movi' list, recursing into 'rec ' groups. For MJPEG — the one
    * video codec decodable on a pure JDK, because each frame IS a
    * standalone JPEG — these ranges feed straight into [[imageFrame]].
    * Codec-compressed video (H.264/VP9/…) has no JDK decoder; those
    * payloads keep the declared stub boundary. */
  def aviFrameRanges(payload: Array[Byte]): Vector[(Int, Int)] = {
    try {
      if (payload == null || payload.length < 12) return Vector.empty
      def ascii(i: Int, n: Int) =
        new String(payload, i, n, java.nio.charset.StandardCharsets.US_ASCII)
      def le32(i: Int): Long =
        ((payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
          ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24))
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return Vector.empty
      val out = Vector.newBuilder[(Int, Int)]
      def isFrame(id: String) =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = ascii(pos, 4)
          val sz = le32(pos + 4)
          if (id == "LIST" && pos + 12 <= end) {
            val lt = ascii(pos + 8, 4)
            val lend = math.min(end.toLong, pos + 8L + sz).toInt
            if (lt == "movi" || (inMovi && lt == "rec ")) walk(pos + 12, lend, inMovi = true)
          } else if (inMovi && isFrame(id) && pos + 8L + sz <= end)
            out += ((pos + 8, sz.toInt))
          // Long advance — see MediaHeaders.wav(): a hostile 32-bit size
          // must not truncate negative and stall the walk
          pos = math.min(pos.toLong + 8L + sz + (sz & 1L), end.toLong).toInt
        }
      }
      walk(12, payload.length, inMovi = false)
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Vector.empty }
  }

  /** Decode selected AVI frames (0-based indices) — MJPEG frames decode
    * as JPEGs; undecodable/missing indices are absent from the result. */
  def videoFrames(payload: Array[Byte], indices: Seq[Int]): Map[Int, ImagePixels] = {
    val ranges = aviFrameRanges(payload)
    indices.flatMap { i =>
      ranges.lift(i).flatMap { case (off, len) =>
        imageFrame(java.util.Arrays.copyOfRange(payload, off, off + len)).map(i -> _)
      }
    }.toMap
  }

  def videoFrame(payload: Array[Byte], idx: Int = 0): Option[ImagePixels] =
    videoFrames(payload, Seq(idx)).get(idx)

  /** Decode a WAV (or any `AudioSystem`-supported) payload to normalized
    * interleaved PCM. Supports the PCM widths WAV actually uses: 8-bit
    * unsigned, 16/24/32-bit signed. */
  def audioSamples(payload: Array[Byte]): Option[AudioPcm] = {
    if (payload == null) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        val order = if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN else java.nio.ByteOrder.LITTLE_ENDIAN
        val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
        val samples = fmt.getSampleSizeInBits match {
          case 8 => // WAV 8-bit is unsigned, midpoint 128
            Array.tabulate(bytes.length)(i => ((bytes(i) & 0xff) - 128) / 128.0f)
          case 16 =>
            Array.tabulate(bytes.length / 2)(i => bb.getShort(i * 2) / 32768.0f)
          case 24 =>
            Array.tabulate(bytes.length / 3) { i =>
              val o = i * 3
              val (b0, b1, b2) =
                if (fmt.isBigEndian) (bytes(o + 2), bytes(o + 1), bytes(o))
                else (bytes(o), bytes(o + 1), bytes(o + 2))
              val v = ((b2 << 16) | ((b1 & 0xff) << 8) | (b0 & 0xff)) // b2 sign-extends
              v / 8388608.0f
            }
          case 32 =>
            Array.tabulate(bytes.length / 4)(i => (bb.getInt(i * 4) / 2147483648.0).toFloat)
          case _ => return None
        }
        Some(AudioPcm(fmt.getSampleRate.toInt, fmt.getChannels, samples))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

object Multimodal {

  /** Typed metadata the decode stage emits alongside features. */
  final case class MediaMeta(
      docId: Long,
      payloadBytes: Long,
      contentSha: String,
      mediaKind: String,
      width: Int,
      height: Int,
      nFrames: Int)

  final case class MediaFeatures(meta: MediaMeta, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_kind", StringType, nullable = false)))

  /** Wrap any table with a binary payload column into the engine's media
    * schema (`doc_id`, `payload: binary`, `media_kind`). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      lit(kind).as("media_kind"))

  /** Decode one payload. Recognized containers get REAL decode:
    * PNG/JPEG/GIF/BMP pixels via [[MediaCodec.imageFrame]] (JDK ImageIO)
    * with features computed from the actual frame-0 pixels, WAV PCM via
    * [[MediaCodec.audioSamples]] with features from the actual samples.
    * Dimensions come from the decoder when it succeeds (header values are
    * the fallback for e.g. a payload whose header parses but whose body is
    * corrupt). Only a payload NO codec recognizes falls back to
    * [[decodeStub]] — the declared boundary where an external video codec
    * would bind. */
  val FeatureDim = 8
  private[ops] def decode(docId: Long, payload: Array[Byte], kind: String): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val shaHex = sha.map("%02x".format(_)).mkString
    MediaHeaders.parse(payload) match {
      case Some(h) if h.format == "wav" =>
        MediaCodec.audioSamples(payload) match {
          case Some(a) =>
            val frames = if (a.channels > 0) a.samples.length / a.channels else a.samples.length
            MediaFeatures(
              MediaMeta(docId, payload.length, shaHex, kind, a.sampleRate, a.channels, frames),
              audioFeatures(a))
          case None =>
            stubFeatures(MediaMeta(docId, payload.length, shaHex, kind, h.width, h.height, h.nFrames), sha)
        }
      case Some(h) if h.format == "avi" =>
        // MJPEG-in-AVI: frame 0 is a standalone JPEG — REAL pixel decode;
        // frame count from the avih header (total stream frames)
        MediaCodec.videoFrame(payload, 0) match {
          case Some(p) =>
            MediaFeatures(
              MediaMeta(docId, payload.length, shaHex, kind, p.width, p.height, h.nFrames),
              imageFeatures(p))
          case None => // codec-compressed video (no JDK decoder): stub boundary
            stubFeatures(MediaMeta(docId, payload.length, shaHex, kind, h.width, h.height, h.nFrames), sha)
        }
      case Some(h) =>
        MediaCodec.imageFrame(payload) match {
          case Some(p) =>
            MediaFeatures(
              MediaMeta(docId, payload.length, shaHex, kind, p.width, p.height, h.nFrames),
              imageFeatures(p))
          case None =>
            stubFeatures(MediaMeta(docId, payload.length, shaHex, kind, h.width, h.height, h.nFrames), sha)
        }
      case None =>
        decodeStub(docId, payload, kind, sha, shaHex)
    }
  }

  /** Features from REAL frame-0 pixels: mean R/G/B, mean luma, luma
    * std-dev, mean horizontal gradient (edge energy), aspect, log-size.
    * All in [0, 1]; accumulation in Double for determinism across
    * partitionings (sequential per image, fixed order). */
  private[ops] def imageFeatures(p: MediaCodec.ImagePixels): Array[Float] = {
    val n = p.argb.length.max(1)
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sy = 0.0; var syy = 0.0; var grad = 0.0
    var i = 0
    while (i < p.argb.length) {
      val v = p.argb(i)
      val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
      val y = 0.299 * r + 0.587 * g + 0.114 * b
      sr += r; sg += g; sb += b; sy += y; syy += y * y
      if ((i + 1) % p.width != 0 && i + 1 < p.argb.length) {
        val w = p.argb(i + 1)
        val yn = 0.299 * ((w >> 16) & 0xff) + 0.587 * ((w >> 8) & 0xff) + 0.114 * (w & 0xff)
        grad += math.abs(yn - y)
      }
      i += 1
    }
    val meanY = sy / n
    val varY = math.max(0.0, syy / n - meanY * meanY)
    val hPairs = math.max(1, (p.width - 1) * p.height)
    Array(
      (sr / n / 255.0).toFloat,
      (sg / n / 255.0).toFloat,
      (sb / n / 255.0).toFloat,
      (meanY / 255.0).toFloat,
      math.min(1.0, math.sqrt(varY) / 128.0).toFloat,
      math.min(1.0, grad / hPairs / 255.0).toFloat,
      (p.width.toDouble / (p.width + p.height).max(1)).toFloat,
      math.min(1.0, math.log(1.0 + n) / (32 * math.log(2.0))).toFloat)
  }

  /** Features from REAL PCM samples: RMS, mean |x|, peak, zero-crossing
    * rate, std-dev, first/second-half RMS, log-length. All in [0, 1]. */
  private[ops] def audioFeatures(a: MediaCodec.AudioPcm): Array[Float] = {
    val n = a.samples.length.max(1)
    var s = 0.0; var ss = 0.0; var sabs = 0.0; var peak = 0.0; var zc = 0
    var ssFirst = 0.0
    val half = a.samples.length / 2
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i).toDouble
      s += v; ss += v * v; sabs += math.abs(v); peak = math.max(peak, math.abs(v))
      if (i > 0 && (a.samples(i - 1) >= 0) != (v >= 0)) zc += 1
      if (i < half) ssFirst += v * v
      i += 1
    }
    val mean = s / n
    val variance = math.max(0.0, ss / n - mean * mean)
    Array(
      math.min(1.0, math.sqrt(ss / n)).toFloat,
      math.min(1.0, sabs / n).toFloat,
      math.min(1.0, peak).toFloat,
      (zc.toDouble / n).toFloat,
      math.min(1.0, math.sqrt(variance)).toFloat,
      math.min(1.0, math.sqrt(ssFirst / half.max(1))).toFloat,
      math.min(1.0, math.sqrt(math.max(0.0, ss - ssFirst) / (n - half).max(1))).toFloat,
      math.min(1.0, math.log(1.0 + n) / (32 * math.log(2.0))).toFloat)
  }

  private def stubFeatures(meta: MediaMeta, sha: Array[Byte]): MediaFeatures = {
    def b(i: Int): Int = sha(i) & 0xff
    MediaFeatures(meta, Array.tabulate(FeatureDim)(i => (b(i * 2) * 256 + b(i * 2 + 1)) / 65535.0f))
  }

  /** STUB for payloads no JDK codec recognizes (codec-compressed video —
    * H.264/VP9/AV1 — the JDK has no bitstream decoder; MJPEG-in-AVI gets
    * REAL decode above): deterministic sha-derived dims and features, so
    * unrecognized media still flows through the pipeline with a stable,
    * testable shape. Swap this boundary for a real decoder bound
    * per-partition (JNI/ONNX session). */
  private def decodeStub(docId: Long, payload: Array[Byte], kind: String,
                         sha: Array[Byte], shaHex: String): MediaFeatures = {
    def b(i: Int): Int = sha(i) & 0xff
    stubFeatures(
      MediaMeta(docId, payload.length, shaHex, kind,
        width = 16 + b(0) % 240, height = 16 + b(1) % 240, nFrames = 1 + b(2) % 30),
      sha)
  }

  /** Batched decode + feature extraction: one codec context per
    * partition, rows streamed through it lazily (no partition-wide
    * materialization). Null payloads are dropped (tombstone semantics,
    * same as the sink's F1 filter). */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame,
                         targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions { rows =>
      // per-partition init happens HERE (ImageIO plugin registry warm-up /
      // external model session) — amortized across the batch
      rows.flatMap { row: Row =>
        val payload = row.getAs[Array[Byte]]("payload")
        if (payload == null) Iterator.empty
        else Iterator.single(decode(row.getAs[Long]("doc_id"), payload,
          row.getAs[String]("media_kind")))
      }
    }
  }

  /** Flat feature table (doc_id, meta columns, features array) — the
    * hand-off point into the embedding/ANN queries (LlmQueries q25/q26
    * shapes). */
  def featureTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAndFeaturize(spark, media)
      .select(
        col("meta.docId").as("doc_id"),
        col("meta.payloadBytes").as("payload_bytes"),
        col("meta.contentSha").as("content_sha"),
        col("meta.mediaKind").as("media_kind"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.nFrames").as("n_frames"),
        col("features"))
  }

  /** Fixed-interval frame sampling: returns (frame_index, frame_sha)
    * rows. For payloads ImageIO can decode (e.g. animated GIF) the sha is
    * computed over the REAL decoded frame pixels, all sampled frames read
    * through ONE reader per document; otherwise it falls back to a
    * deterministic content-sha scheme (the video-codec STUB boundary).
    * Frames are never materialized into the output — only hashes. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { row: Row =>
        val payload = row.getAs[Array[Byte]]("payload")
        if (payload == null) Iterator.empty
        else {
          val mf = decode(row.getAs[Long]("doc_id"), payload, row.getAs[String]("media_kind"))
          val wanted = 0 until mf.meta.nFrames by everyNth
          val decoded =
            if (MediaHeaders.parse(payload).exists(_.format == "avi"))
              MediaCodec.videoFrames(payload, wanted) // MJPEG frames, one container walk
            else MediaCodec.imageFrames(payload, wanted)
          wanted.iterator.map { fi =>
            val sha = decoded.get(fi) match {
              case Some(p) => // hash of the real pixels of this frame
                val bb = java.nio.ByteBuffer.allocate(p.argb.length * 4)
                p.argb.foreach(bb.putInt)
                val d = java.security.MessageDigest.getInstance("SHA-256").digest(bb.array())
                s"${d.map("%02x".format(_)).mkString.take(16)}:$fi"
              case None => s"${mf.meta.contentSha.take(16)}:$fi"
            }
            (mf.meta.docId, fi, sha)
          }
        }
      }
    }.toDF("doc_id", "frame_index", "frame_sha")
  }
}
