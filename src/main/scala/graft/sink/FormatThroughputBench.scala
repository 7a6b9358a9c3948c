package graft.sink

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Encode → gzip → stage throughput for the three wire formats the sink
  * writes, grounding the reference's only published performance claim —
  * "Avro (with schema registry) and CSV perform more-or-less similarly"
  * (reference: README.md:703) — with a measured number per round instead
  * of a sentence. Each format pushes the SAME logical records through the
  * real [[RollingFileWriter]] path (per-record append, size-based rolls,
  * gzip, deterministic staging names); Avro pays container framing with
  * per-BLOCK flushes, as the reference's writer does
  * (AvroRecordWriterProvider.java:38 `setFlushOnEveryBlock(true)`).
  * Staged files are deleted as they roll, so the bench measures the
  * pipeline, not the disk. */
object FormatThroughputBench {

  private val avroSchemaJson =
    """{"type":"record","name":"benchrec","fields":[
       {"name":"id","type":"long"},
       {"name":"name","type":"string"},
       {"name":"value","type":"double"},
       {"name":"ts","type":"long"}]}""".stripMargin

  /** Time encode+stage of `records` synthetic records per format.
    * Returns format → seconds (insertion-ordered: json, csv, avro). */
  def run(records: Int, tmpDir: String): Seq[(String, Double)] = {
    require(records > 0)
    Seq("json", "csv", "avro").map { fmt => fmt -> timeFormat(fmt, records, tmpDir) }
  }

  private def timeFormat(fmt: String, records: Int, tmpDir: String): Double = {
    val provider: FormatWriterProvider = fmt match {
      case "avro" => new AvroContainerWriter(avroSchemaJson)
      case other  => FormatWriters.forFormat(other)
    }
    // avro encode context, built once (amortized like a real encode stage)
    lazy val avroCtx = {
      import org.apache.avro.Schema
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      val schema = new Schema.Parser().parse(avroSchemaJson)
      (schema, new GenericDatumWriter[GenericRecord](schema))
    }
    var avroEncoder: org.apache.avro.io.BinaryEncoder = null

    def encode(i: Int): Array[Byte] = fmt match {
      case "json" =>
        s"""{"id":$i,"name":"user-$i","value":${i * 7 % 100}.25,"ts":${1700000000000L + i}}"""
          .getBytes(UTF_8)
      case "csv" =>
        s"$i,user-$i,${i * 7 % 100}.25,${1700000000000L + i}".getBytes(UTF_8)
      case "avro" =>
        val (schema, writer) = avroCtx
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i.toLong)
        rec.put("name", s"user-$i")
        rec.put("value", (i * 7 % 100) + 0.25)
        rec.put("ts", 1700000000000L + i)
        val bos = new ByteArrayOutputStream(64)
        avroEncoder = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, avroEncoder)
        writer.write(rec, avroEncoder)
        avroEncoder.flush()
        bos.toByteArray
    }

    val t0 = System.nanoTime()
    val w = new RollingFileWriter(
      baseTempDir = tmpDir, topic = s"fmt-$fmt", partition = 0, provider = provider,
      flushSizeBytes = 1L << 20, flushIntervalMs = Long.MaxValue / 4,
      onRoll = f => { java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(f.path)); () })
    try {
      var i = 0
      while (i < records) {
        w.write(SinkRecord(s"fmt-$fmt", 0, i.toLong, null, encode(i)))
        i += 1
      }
    } finally w.close()
    // remove the per-writer temp dir (close() staged+drained everything)
    try {
      java.nio.file.Files.walk(w.dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    } catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
  }
}
