package graft.sink

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output tests per wire format, mirroring the reference's
  * formatWriter tests (JsonRecordWriterProviderTest.java:24-51,
  * StringRecordWriterProviderTest.java:21-47,
  * ByteArrayWriterProviderTest.java:21-47, AvroRecordWriterTest.java:25-64).
  */
class FormatWriterSpec extends AnyFunSuite {
  private def rec(v: String, off: Long = 0): SinkRecord =
    SinkRecord("t", 0, off, null, if (v == null) null else v.getBytes(UTF_8))

  private def written(p: FormatWriterProvider, rs: Seq[SinkRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val a = p.open(bos)
    rs.foreach(a.append)
    a.close()
    bos.toByteArray
  }

  test("json lines: one object per line (MULTIJSON)") {
    val out = written(JsonLinesWriter, (0 until 10).map(i => rec(s"""{"hello":$i}""", i)))
    assert(new String(out, UTF_8) == (0 until 10).map(i => s"""{"hello":$i}""" + "\n").mkString)
  }

  test("json lines: empty-after-serialization records are skipped (F2)") {
    val out = written(JsonLinesWriter, Seq(rec("""{"a":1}"""), rec(""), rec(null), rec("""{"b":2}""")))
    assert(new String(out, UTF_8) == "{\"a\":1}\n{\"b\":2}\n")
  }

  test("string lines: value + newline") {
    val out = written(StringLinesWriter, (0 until 5).map(i => rec(s"hello-$i", i)))
    assert(new String(out, UTF_8) == (0 until 5).map(i => s"hello-$i\n").mkString)
  }

  test("bytes: raw pass-through, newline separated") {
    val out = written(BytesWriter, Seq(rec("msg-0"), rec("msg-1")))
    assert(new String(out, UTF_8) == "msg-0\nmsg-1\n")
  }

  test("avro: container file round-trips records with schema") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericDatumReader}
    import org.apache.avro.io.EncoderFactory
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"text","type":"string"},{"name":"id","type":"int"}]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    def datum(text: String, id: Int): Array[Byte] = {
      val r = new GenericData.Record(schema)
      r.put("text", text); r.put("id", id)
      val bos = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      new GenericDatumWriter[GenericRecord](schema).write(r, enc)
      enc.flush(); bos.toByteArray
    }
    val recs = (0 until 3).map(i => SinkRecord("t", 0, i, null, datum(s"txt$i", i)))
    val out = written(new AvroContainerWriter(schemaJson), recs)
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(out), new GenericDatumReader[GenericRecord](schema))
    val got = Iterator.continually(reader).takeWhile(_.hasNext).map(_.next())
      .map(r => (r.get("text").toString, r.get("id").asInstanceOf[Int])).toSeq
    assert(got == (0 until 3).map(i => (s"txt$i", i)))
  }

  test("avro: multi-record files pack many records per container block (per-BLOCK flush, not per-record)") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericDatumReader}
    import org.apache.avro.io.EncoderFactory
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"text","type":"string"},{"name":"id","type":"int"}]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new GenericDatumWriter[GenericRecord](schema)
    def datum(text: String, id: Int): Array[Byte] = {
      val r = new GenericData.Record(schema)
      r.put("text", text); r.put("id", id)
      val bos = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      w.write(r, enc); enc.flush(); bos.toByteArray
    }
    val n = 200
    val out = written(new AvroContainerWriter(schemaJson),
      (0 until n).map(i => SinkRecord("t", 0, i, null, datum(s"payload-$i", i))))
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(out), new GenericDatumReader[GenericRecord](schema))
    var blocks = 0; var recs = 0
    while (reader.hasNext) {
      val inBlock = reader.getBlockCount.toInt // datums in the current block
      blocks += 1; recs += inBlock
      var i = 0; while (i < inBlock) { reader.next(); i += 1 }
    }
    assert(recs == n, s"container must round-trip all $n records, got $recs")
    // a per-record flush would close a block per datum (blocks == n); the
    // reference flushes per ~64 KB block (AvroRecordWriterProvider.java:38)
    assert(blocks < n / 10, s"expected few blocks for $n small records, got $blocks")
  }

  test("avro: bytes that don't decode with the writer schema fail fast at append time") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"text","type":"string"},{"name":"id","type":"int"}]}""".stripMargin
    // junk value bytes: appendEncoded alone would stage a corrupt block
    // detected only when a reader consumes the file — the first-datum
    // contract check must surface it at write time instead
    val junk = SinkRecord("t", 0, 0, null, Array[Byte](0x7f, 0x00, 0x13, 0x37))
    val ex = intercept[graft.config.SinkConfigException] {
      written(new AvroContainerWriter(schemaJson), Seq(junk))
    }
    assert(ex.getMessage.contains("writer schema"))
    // a valid first datum followed by later appends stays on the fast path
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new GenericDatumWriter[GenericRecord](schema)
    def datum(text: String, id: Int): Array[Byte] = {
      val r = new GenericData.Record(schema)
      r.put("text", text); r.put("id", id)
      val bos = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      w.write(r, enc); enc.flush(); bos.toByteArray
    }
    val ok = written(new AvroContainerWriter(schemaJson),
      (0 until 3).map(i => SinkRecord("t", 0, i, null, datum(s"v$i", i))))
    assert(ok.nonEmpty)
  }

  test("format dispatch matches the reference's provider selection") {
    assert(FormatWriters.forFormat("multijson") == JsonLinesWriter)
    assert(FormatWriters.forFormat("json") == JsonLinesWriter)
    assert(FormatWriters.forFormat("csv") == StringLinesWriter)
    assert(FormatWriters.forFormat("parquet") == BytesWriter)
    assert(FormatWriters.forFormat("avro").isInstanceOf[AvroContainerWriter] ||
      FormatWriters.forFormat("avro") == BytesWriter) // avro w/o schema = bytes pass-through
    assertThrows[graft.config.SinkConfigException](FormatWriters.forFormat("exotic!"))
  }
}
