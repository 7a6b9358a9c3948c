package graft.sink

import java.io.ByteArrayOutputStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Struct→Avro encode stage + container framing round-trip (the E2 path
  * the reference covers in AvroRecordWriterTest.java:25-64). */
class AvroEncodeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("schema conversion covers atomics, nullables, nested structs, arrays, maps") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("scores", ArrayType(DoubleType, containsNull = false)),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("inner", StructType(Seq(StructField("x", IntegerType, nullable = false))))))
    val avro = AvroEncode.toAvroSchema(st)
    assert(avro.getField("id").schema().getType.toString == "LONG")
    assert(avro.getField("name").schema().getType.toString == "UNION")
    assert(avro.getField("scores").schema().getType.toString == "UNION") // nullable array col
    assert(avro.getField("inner").schema().toString.contains("\"x\""))
    assertThrows[IllegalArgumentException](
      AvroEncode.toAvroSchema(StructType(Seq(StructField("d", CalendarIntervalType)))))
  }

  test("encode stage + container writer round-trips through Avro reader") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", Seq(1.5, 2.5), 0, 10L),
      (2L, "beta", Seq(3.0), 1, 11L),
      (3L, null.asInstanceOf[String], Seq.empty[Double], 0, 12L))
      .toDF("id", "name", "scores", "partition", "offset")

    val (encoded, schemaJson) = AvroEncode.encode(df, passthrough = Seq("partition", "offset"))
    assert(encoded.schema.fieldNames.toSeq == Seq("partition", "offset", "value"))
    val rows = encoded.collect().sortBy(_.getAs[Long]("offset"))
    assert(rows.forall(_.getAs[Array[Byte]]("value").nonEmpty))

    // frame the binary datums with the container writer and read back
    val bos = new ByteArrayOutputStream()
    val appender = new AvroContainerWriter(schemaJson).open(bos)
    rows.zipWithIndex.foreach { case (r, i) =>
      appender.append(SinkRecord("t", 0, i, null, r.getAs[Array[Byte]]("value")))
    }
    appender.close()

    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bos.toByteArray),
      new GenericDatumReader[GenericRecord]())
    val got = Iterator.continually(reader).takeWhile(_.hasNext).map(_.next())
      .map(r => (r.get("id").asInstanceOf[Long], Option(r.get("name")).map(_.toString)))
      .toSeq
    assert(got == Seq((1L, Some("alpha")), (2L, Some("beta")), (3L, None)))
  }
}
