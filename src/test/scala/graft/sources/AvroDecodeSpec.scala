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
}
