package graft.sink

import java.io.OutputStream
import java.nio.charset.StandardCharsets

/** Appends records to an open (already gzip-wrapped) output stream in one
  * wire format. `close()` finishes format-level framing (e.g. Avro
  * container sync) but must NOT close the underlying stream — the
  * [[RollingFileWriter]] owns stream lifecycle.
  *
  * Format semantics mirror the reference's RecordWriterProviders
  * (reference: formatWriter/JsonRecordWriterProvider.java:36-77,
  * StringRecordWriterProvider.java:17-29, ByteRecordWriterProvider.java:17-42,
  * AvroRecordWriterProvider.java:26-73).
  */
trait RecordAppender {
  def append(r: SinkRecord): Unit
  def close(): Unit = ()
}

trait FormatWriterProvider extends Serializable {
  /** File extension (before `.gz`). */
  def ext: String
  def open(out: OutputStream): RecordAppender
}

private object Nl { val bytes: Array[Byte] = "\n".getBytes(StandardCharsets.UTF_8) }

/** Newline-delimited JSON (Kusto MULTIJSON): one JSON object per line.
  * Values arrive as serialized JSON bytes (encoded upstream via
  * `to_json(struct(...))` or already-JSON Kafka payloads). Records whose
  * payload is empty after serialization are skipped — the reference's
  * "empty after serialization" filter
  * (reference: JsonRecordWriterProvider.java:52-57).
  */
object JsonLinesWriter extends FormatWriterProvider {
  val ext = "json"
  def open(out: OutputStream): RecordAppender = new RecordAppender {
    def append(r: SinkRecord): Unit = {
      val v = r.value
      if (v != null && v.nonEmpty) { out.write(v); out.write(Nl.bytes) }
    }
  }
}

/** Plain string lines: `value.toString + "\n"` — used for CSV payloads,
  * which arrive pre-formatted as strings
  * (reference: StringRecordWriterProvider.java:17-29). */
object StringLinesWriter extends FormatWriterProvider {
  val ext = "csv"
  def open(out: OutputStream): RecordAppender = new RecordAppender {
    def append(r: SinkRecord): Unit = {
      if (r.value != null && r.value.nonEmpty) { out.write(r.value); out.write(Nl.bytes) }
    }
  }
}

/** Raw bytes pass-through, newline-separated. Used for opaque payloads
  * (pre-serialized parquet/ORC/avro blobs ride through untouched)
  * (reference: ByteRecordWriterProvider.java:17-42). */
object BytesWriter extends FormatWriterProvider {
  val ext = "bin"
  def open(out: OutputStream): RecordAppender = new RecordAppender {
    def append(r: SinkRecord): Unit = {
      if (r.value != null && r.value.nonEmpty) { out.write(r.value); out.write(Nl.bytes) }
    }
  }
}

/** Avro object-container file: each record's value is one Avro datum; the
  * container carries the writer schema, so readers self-describe
  * (reference: AvroRecordWriterProvider.java:26-73). Flush granularity is
  * per-BLOCK, not per-record: the reference's `setFlushOnEveryBlock(true)`
  * (AvroRecordWriterProvider.java:38) flushes only when a ~64 KB block
  * completes naturally — closing a block (sync marker + deflate) per
  * record measured ~9× slower than CSV. The value bytes must be Avro
  * binary-encoded with `schema` (the upstream [[AvroEncode]] stage), so
  * they append as pre-encoded datums with no decode → re-encode round
  * trip; tests encode GenericRecords directly through the same path.
  */
final class AvroContainerWriter(schemaJson: String) extends FormatWriterProvider {
  val ext = "avro"
  def open(out: OutputStream): RecordAppender = new RecordAppender {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
    private val schema = new Schema.Parser().parse(schemaJson)
    private val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.setFlushOnEveryBlock(true) // per-block, as the reference
    writer.create(schema, new java.io.FilterOutputStream(out) {
      // FilterOutputStream's default array write is byte-at-a-time —
      // delegate block writes directly or every container block crawls
      // through the gzip layer one byte per call
      override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
      override def close(): Unit = flush() // keep underlying stream open
    })
    // appendEncoded skips decode→re-encode, which also skips all
    // validation: bytes that aren't actually Avro-encoded with `schema`
    // would produce a corrupt block detected only by a reader. Decode
    // the FIRST datum per file as a fail-fast contract check (one
    // decode per file, not per record) so a mis-wired upstream encoder
    // surfaces at write time with a pointed error.
    private var validatedFirst = false
    private def validateFirst(value: Array[Byte]): Unit = {
      try {
        val dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(value, null)
        new org.apache.avro.generic.GenericDatumReader[GenericRecord](schema).read(null, dec)
        if (!dec.isEnd) throw new java.io.IOException("trailing bytes after the datum")
      } catch { case e: Exception =>
        throw new graft.config.SinkConfigException(
          "avro value bytes do not decode with the mapping's writer schema " +
          s"(mis-wired upstream encoder?): ${e.getMessage}")
      }
      validatedFirst = true
    }
    def append(r: SinkRecord): Unit = {
      if (r.value != null && r.value.nonEmpty) {
        if (!validatedFirst) validateFirst(r.value)
        writer.appendEncoded(java.nio.ByteBuffer.wrap(r.value))
      }
    }
    override def close(): Unit = writer.close()
  }
}

object FormatWriters {
  /** Provider for a mapping's wire format. Avro needs the writer schema. */
  def forFormat(format: String, avroSchemaJson: Option[String] = None): FormatWriterProvider =
    format.toLowerCase match {
      case "json" | "singlejson" | "multijson" => JsonLinesWriter
      case "csv" | "string" | "txt" | "tsv"    => StringLinesWriter
      case "avro" | "apacheavro" =>
        avroSchemaJson.map(new AvroContainerWriter(_)).getOrElse(BytesWriter)
      case "bytes" | "parquet" | "orc"         => BytesWriter
      case other =>
        throw new graft.config.SinkConfigException(s"unsupported sink format '$other'")
    }
}
