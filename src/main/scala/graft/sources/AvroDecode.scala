package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Source-side Avro decode — the inverse of [[graft.sink.AvroEncode]] and
  * the engine's stand-in for `from_avro` (the spark-avro module is absent
  * in this offline environment). The reference ingests Avro-encoded Kafka
  * values through Connect's AvroConverter + schema registry
  * (reference: README.md:137-156, AvroRecordWriterProvider.java:26-73);
  * here the writer schema arrives as a JSON string (the registry's
  * payload) and `decode` turns the kafka `value: binary` column into the
  * record's typed columns so an avro-topic pipeline can parse its input
  * natively.
  *
  * Physical shape: schema → StructType conversion happens once on the
  * driver; per-row decoding is map-side `mapPartitions` with ONE parser +
  * datum reader per partition (the legitimate per-partition-init pattern —
  * Avro readers are stateful and not serializable). No shuffle.
  */
object AvroDecode {

  /** Avro schema → Spark StructType (inverse of AvroEncode.toAvroSchema):
    * `[null, T]` unions become nullable fields; `date` / `timestamp-micros`
    * logical types restore DateType / TimestampType. */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions are supported, got $s")
      (fieldType(nonNull.head)._1, branches.size > nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) (TimestampType, false)
      else (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.ENUM => (StringType, false)
    case Schema.Type.RECORD => (toStructType(s), false)
    case Schema.Type.ARRAY =>
      val (et, n) = fieldType(s.getElementType)
      (ArrayType(et, containsNull = n), false)
    case Schema.Type.MAP =>
      val (vt, n) = fieldType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = n), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro decode type: $other")
  }

  private def toSpark(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) => toSpark(r.get(i), f.dataType) }.toSeq)
    case (s: CharSequence, StringType) => s.toString // Utf8 included
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (l: java.util.List[_], ArrayType(et, _)) => l.asScala.map(toSpark(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) => k.toString -> toSpark(x, vt) }.toMap
    case (days: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.toLong))
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (x, _) => x
  }

  /** Avro binary datum → Row under `schema`/`structType` (which must agree:
    * structType = toStructType(schema)). */
  def decodeDatum(bytes: Array[Byte], reader: GenericDatumReader[GenericRecord],
                  structType: StructType): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    toSpark(reader.read(null, dec), structType).asInstanceOf[Row]
  }

  /** DataFrame stage: decode `valueCol` (Avro binary) into the record's
    * top-level columns, keeping `passthrough` columns (e.g. kafka
    * coordinates) in front. Rows with a null value are dropped (tombstones
    * have no datum to decode — filter them upstream to route elsewhere). */
  def decode(df: DataFrame, writerSchemaJson: String,
             valueCol: String = "value", passthrough: Seq[String] = Nil): DataFrame = {
    val structType = toStructType(new Schema.Parser().parse(writerSchemaJson))
    val passFields = passthrough.map(n => df.schema(n))
    val outSchema = StructType(passFields ++ structType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val valueIdx = df.schema.fieldIndex(valueCol)
    val passIdx = passthrough.map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(writerSchemaJson) // parse once per partition
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.flatMap { row =>
        row.getAs[Array[Byte]](valueIdx) match {
          case null => Iterator.empty
          case bytes =>
            val decoded = decodeDatum(bytes, reader, structType)
            Iterator.single(Row.fromSeq(passIdx.map(row.get) ++ decoded.toSeq))
        }
      }
    }(enc)
  }
}
