package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) ride through the
  * engine as opaque `binary` payloads plus typed metadata, and decode /
  * feature-extraction runs batched per partition — the Spark-side
  * plumbing (schema, partitioning, batch shape) is real, and container
  * METADATA (dimensions, frame counts, sample counts) is parsed from the
  * actual PNG/JPEG/WAV bytes ([[MediaHeaders]]); only the pixel/sample
  * codec call itself is a deterministic stub because no media libraries
  * exist in this environment (marked STUB below; swap `decodeStub`'s
  * feature step for a real decoder bound per-partition, e.g. via
  * JNI/ONNX session reuse).
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
  * count), JPEG SOFn, and WAV RIFF fmt/data chunks. These are public,
  * stable byte layouts; no codec library is needed to read dimensions,
  * frame counts, or sample counts, so this part of multimodal decode is
  * real even in a codec-less environment (the pixel/sample decode itself
  * stays behind the declared stub in [[Multimodal]]). */
object MediaHeaders {

  /** `width`/`height` are pixels for images; for WAV audio `width`
    * carries the sample rate and `height` the channel count (the two
    * discriminative dims of an audio stream). `nFrames` is 1 for still
    * images, the acTL frame count for animated PNG, and the sample-frame
    * count (data bytes / block align) for WAV. */
  final case class Header(format: String, width: Int, height: Int, nFrames: Int)

  def parse(b: Array[Byte]): Option[Header] =
    if (b == null) None else png(b).orElse(jpeg(b)).orElse(gif(b)).orElse(wav(b))

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
    * byte, then the same sub-block chain). Truncated payloads report the
    * frames counted so far (min 1) rather than failing the header. */
  private def gif(b: Array[Byte]): Option[Header] = {
    if (b.length < 10) return None
    val sig = ascii(b, 0, 6)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var frames = 0
    if (b.length >= 13) {
      var pos = 13 // 6 sig + 7 logical screen descriptor
      if ((b(10) & 0x80) != 0) pos += 3 * (1 << ((b(10) & 7) + 1)) // global color table
      def skipSubBlocks(): Unit = {
        var sz = if (pos < b.length) b(pos) & 0xff else 0
        while (sz != 0 && pos + 1 + sz <= b.length) {
          pos += 1 + sz
          sz = if (pos < b.length) b(pos) & 0xff else 0
        }
        pos += 1 // terminator (or step past a truncated length byte)
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
              skipSubBlocks()
            }
          case 0x21 => // extension: introducer + label, then sub-blocks
            pos += 2
            skipSubBlocks()
          case 0x3b => walking = false // trailer
          case _    => walking = false // desynced: keep what we counted
        }
      }
    }
    Some(Header("gif", le16(b, 6), le16(b, 8), math.max(1, frames)))
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
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (blockAlign <= 0 || dataLen < 0) None
    else Some(Header("wav", sampleRate, channels, (dataLen / blockAlign).toInt))
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

  /** Decode: width/height/frames come from REAL container-header parsing
    * ([[MediaHeaders]]: PNG IHDR + APNG acTL, JPEG SOFn, WAV RIFF — pure
    * JVM, public formats) whenever the payload is a recognized container;
    * the FEATURE VECTOR (and the dims of unrecognized payloads) remains a
    * deterministic sha-derived STUB, because pixel/sample decode needs a
    * codec library this environment lacks — swap `decodeStub`'s feature
    * step for a real decoder bound per-partition (JNI/ONNX session). */
  val FeatureDim = 8
  private[ops] def decodeStub(docId: Long, payload: Array[Byte], kind: String): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val shaHex = sha.map("%02x".format(_)).mkString
    def b(i: Int): Int = sha(i) & 0xff
    val meta = MediaHeaders.parse(payload) match {
      case Some(h) => MediaMeta(docId, payload.length, shaHex, kind, h.width, h.height, h.nFrames)
      case None => // unrecognized container: sha-derived stub dims
        MediaMeta(docId, payload.length, shaHex, kind,
          width = 16 + b(0) % 240, height = 16 + b(1) % 240, nFrames = 1 + b(2) % 30)
    }
    val features = Array.tabulate(FeatureDim)(i => (b(i * 2) * 256 + b(i * 2 + 1)) / 65535.0f)
    MediaFeatures(meta, features)
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
      // per-partition init happens HERE (codec/model session) — amortized
      rows.flatMap { row: Row =>
        val payload = row.getAs[Array[Byte]]("payload")
        if (payload == null) Iterator.empty
        else Iterator.single(decodeStub(row.getAs[Long]("doc_id"), payload,
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

  /** Fixed-interval frame sampling over a video-like payload: returns
    * (frame_index, frame_sha) rows without materializing frames — the
    * plumbing for "sample every Nth frame" in a training pipeline. The
    * frame extraction itself is the same STUB boundary. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    import spark.implicits._
    decodeAndFeaturize(spark, media)
      .flatMap { mf =>
        (0 until mf.meta.nFrames by everyNth).map { fi =>
          // STUB frame content hash — a real codec hands back pixel data here
          (mf.meta.docId, fi, s"${mf.meta.contentSha.take(16)}:$fi")
        }
      }
      .toDF("doc_id", "frame_index", "frame_sha")
  }
}
