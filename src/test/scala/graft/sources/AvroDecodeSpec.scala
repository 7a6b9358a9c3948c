package graft.sources

import graft.sink.AvroEncode
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Source-side Avro decode: struct → AvroEncode → AvroDecode must be the
  * identity (schema and values), covering the converter role the
  * reference delegates to Connect's AvroConverter
  * (reference: README.md:137-156). */
class AvroDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("active", BooleanType, nullable = false),
    StructField("ratio", DoubleType, nullable = false),
    StructField("small", IntegerType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("born", DateType, nullable = true),
    StructField("seen", TimestampType, nullable = true),
    StructField("scores", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
    StructField("inner", StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", StringType, nullable = true))), nullable = true)))

  private def sampleDf = {
    val rows = Seq(
      Row(1L, "alpha", true, 1.5, 7, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2021-03-14"),
        java.sql.Timestamp.valueOf("2021-03-14 01:59:26.535897"),
        Seq(1.0, 2.0), Map("k" -> "v", "n" -> null), Row(42, "deep")),
      Row(2L, null, false, -0.25, -1, null, null, null, Seq.empty[Double], Map.empty[String, String], Row(0, null)),
      Row(3L, "gamma", true, 0.0, 0, Array.empty[Byte],
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001"),
        null, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("toStructType inverts toAvroSchema, including date/timestamp logical types") {
    val avro = AvroEncode.toAvroSchema(schema)
    assert(AvroDecode.toStructType(avro) == schema)
  }

  test("encode → decode round-trips every value, with passthrough coordinates in front") {
    val df = sampleDf.withColumn("offset", col("id") * 100)
    val (encoded, schemaJson) = AvroEncode.encode(df, passthrough = Seq("offset"))
    val decoded = AvroDecode.decode(encoded, schemaJson, passthrough = Seq("offset"))

    assert(decoded.schema.fieldNames.toSeq == "offset" +: schema.fieldNames.toSeq)
    assert(StructType(decoded.schema.drop(1)) == schema)

    // compare as canonical JSON (binary/map columns aren't comparable via except)
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = d.columns.sorted.map(c => col(c).as(c))
      d.select(to_json(struct(cols.toSeq: _*))).collect().map(_.getString(0)).sorted.toSeq
    }
    assert(canon(decoded) == canon(df))
  }

  test("null values (tombstones) are dropped by decode") {
    val df = sampleDf
    val (encoded, schemaJson) = AvroEncode.encode(df)
    import spark.implicits._
    val withTombstone = encoded.union(Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("value"))
    assert(AvroDecode.decode(withTombstone, schemaJson).count() == 3)
  }

  // --------------------------------------------- registry wire format

  private val v1Json =
    """{"type":"record","name":"user","fields":[
         {"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
  private val v2Json =
    """{"type":"record","name":"user","fields":[
         {"name":"id","type":"long"},{"name":"name","type":"string"},
         {"name":"tier","type":"string","default":"free"}]}"""

  private def datum(json: String, values: Any*): Array[Byte] =
    AvroEncode.encodeRow(Row.fromSeq(values),
      new org.apache.avro.Schema.Parser().parse(json))

  test("confluent framing: magic byte + big-endian schema id round-trip") {
    val framed = AvroDecode.frameConfluent(0x01020304, Array[Byte](9, 9))
    assert(framed.take(5).toSeq == Seq[Byte](0, 1, 2, 3, 4))
    assert(AvroDecode.confluentSchemaId(framed) == 0x01020304)
    assert(intercept[IllegalArgumentException](
      AvroDecode.confluentSchemaId(Array[Byte](1, 0, 0, 0, 7, 9))).getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException](
      AvroDecode.confluentSchemaId(Array[Byte](0, 0))).getMessage.contains("short"))
  }

  test("decodeConfluent: two writer-schema versions resolve against one reader schema") {
    import spark.implicits._
    val framed = Seq(
      (100L, AvroDecode.frameConfluent(1, datum(v1Json, 1L, "alpha"))),
      (200L, AvroDecode.frameConfluent(2, datum(v2Json, 2L, "beta", "pro"))),
      (300L, null.asInstanceOf[Array[Byte]])) // tombstone dropped
      .toDF("offset", "value")
    val out = AvroDecode.decodeConfluent(framed, readerSchemaJson = v2Json,
      writerSchemasById = Map(1 -> v1Json, 2 -> v2Json), passthrough = Seq("offset"))
    assert(out.schema.fieldNames.toSeq == Seq("offset", "id", "name", "tier"))
    val rows = out.orderBy("offset").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    // v1 records take the reader default for the added field
    assert(rows.toSeq == Seq((100L, 1L, "alpha", "free"), (200L, 2L, "beta", "pro")))
  }

  test("decodeConfluent: unknown schema id fails loudly with the known-id list") {
    import spark.implicits._
    val framed = Seq(Tuple1(AvroDecode.frameConfluent(9, datum(v1Json, 1L, "x")))).toDF("value")
    val e = intercept[Exception](
      AvroDecode.decodeConfluent(framed, v2Json, Map(1 -> v1Json, 2 -> v2Json)).collect())
    val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
    assert(msg.contains("unknown schema id 9") && msg.contains("1, 2"))
  }

  test("validateConfluentSchemas collects per-schema parse errors") {
    assert(AvroDecode.validateConfluentSchemas(v2Json, Map(1 -> v1Json)).isEmpty)
    val errs = AvroDecode.validateConfluentSchemas("not json", Map(1 -> "{", 2 -> v2Json))
    assert(errs.size == 2)
    assert(errs.exists(_.startsWith("reader schema")) && errs.exists(_.startsWith("schema id 1")))
  }
}
