package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media (image/audio/video) ride through the
  * engine as opaque `binary` payloads plus typed metadata, and decode /
  * feature-extraction runs batched per partition — the Spark-side
  * plumbing (schema, partitioning, batch shape) is real; the actual codec
  * call is a deterministic stub because no media libraries exist in this
  * environment (marked STUB below; swap `decodeStub` for a real decoder
  * bound per-partition, e.g. via JNI/ONNX session reuse).
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

  /** STUB decode: a real implementation would hand `payload` to an image/
    * audio codec. This stand-in derives width/height/frames and a
    * FeatureDim-float vector deterministically from the payload bytes, so
    * the plumbing (batching, schema, null handling) is fully testable and
    * reproducible. */
  val FeatureDim = 8
  private[ops] def decodeStub(docId: Long, payload: Array[Byte], kind: String): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val shaHex = sha.map("%02x".format(_)).mkString
    def b(i: Int): Int = sha(i) & 0xff
    val meta = MediaMeta(docId, payload.length, shaHex, kind,
      width = 16 + b(0) % 240, height = 16 + b(1) % 240, nFrames = 1 + b(2) % 30)
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
