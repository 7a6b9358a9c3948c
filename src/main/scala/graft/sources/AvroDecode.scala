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

  // ---------------------------------------------- registry wire format

  /** The Confluent schema-registry wire format's magic byte: one 0x00,
    * then a big-endian 4-byte schema id, then the Avro binary datum.
    * This framing is public knowledge (the registry serdes' documented
    * wire format); the reference's default deployment consumes it via
    * Connect's AvroConverter (reference: README.md:137-156). */
  val ConfluentMagic: Byte = 0x00

  /** Frame a bare Avro datum in the registry wire format (test/fixture
    * side of [[decodeConfluent]]). */
  def frameConfluent(schemaId: Int, datum: Array[Byte]): Array[Byte] =
    java.nio.ByteBuffer.allocate(5 + datum.length)
      .put(ConfluentMagic).putInt(schemaId).put(datum).array()

  /** Parse and validate the 5-byte header; returns the schema id. */
  def confluentSchemaId(bytes: Array[Byte]): Int = {
    if (bytes.length < 5)
      throw new IllegalArgumentException(
        s"registry-framed record too short: ${bytes.length} bytes (need 5-byte header)")
    if (bytes(0) != ConfluentMagic)
      throw new IllegalArgumentException(
        f"bad magic byte 0x${bytes(0)}%02x (expected 0x00 registry framing)")
    ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) | ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
  }

  /** Preflight for a registry-framed avro mapping: every configured
    * writer schema and the reader schema must parse as Avro records.
    * Returns collected error strings (empty = valid) — same contract as
    * the other [[graft.pipeline.Preflight]] checks. */
  def validateConfluentSchemas(readerSchemaJson: String,
                               writerSchemasById: Map[Int, String]): Seq[String] = {
    def parseErr(what: String, json: String): Option[String] =
      try { new Schema.Parser().parse(json); None }
      catch { case e: Exception => Some(s"$what: unparseable Avro schema: ${e.getMessage}") }
    (parseErr("reader schema", readerSchemaJson) ++
      writerSchemasById.toSeq.sortBy(_._1).flatMap { case (id, j) => parseErr(s"schema id $id", j) }).toSeq
  }

  /** DataFrame stage: decode registry-framed Avro (`0x00` + schema id +
    * datum) under schema EVOLUTION — each record is decoded with its
    * writer schema (looked up by the framed id) resolved against the
    * single `readerSchemaJson` that defines the output columns, so a
    * topic whose producers span schema versions decodes to one uniform
    * DataFrame (new fields take reader defaults, dropped fields are
    * skipped — standard Avro resolution). Unknown ids fail loudly with
    * the known-id list. Per-partition: one parsed reader schema and one
    * cached datum reader PER WRITER ID (bounded by the schema count, not
    * the row count). No shuffle. */
  def decodeConfluent(df: DataFrame, readerSchemaJson: String,
                      writerSchemasById: Map[Int, String],
                      valueCol: String = "value", passthrough: Seq[String] = Nil): DataFrame = {
    val errs = validateConfluentSchemas(readerSchemaJson, writerSchemasById)
    require(errs.isEmpty, errs.mkString("; "))
    val structType = toStructType(new Schema.Parser().parse(readerSchemaJson))
    val passFields = passthrough.map(n => df.schema(n))
    val outSchema = StructType(passFields ++ structType.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val valueIdx = df.schema.fieldIndex(valueCol)
    val passIdx = passthrough.map(df.schema.fieldIndex)
    df.mapPartitions { rows =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      rows.flatMap { row =>
        row.getAs[Array[Byte]](valueIdx) match {
          case null => Iterator.empty
          case bytes =>
            val id = confluentSchemaId(bytes)
            val reader = readers.getOrElseUpdate(id, {
              val writerJson = writerSchemasById.getOrElse(id,
                throw new IllegalArgumentException(
                  s"unknown schema id $id (known: ${writerSchemasById.keys.toSeq.sorted.mkString(", ")})"))
              new GenericDatumReader[GenericRecord](
                new Schema.Parser().parse(writerJson), readerSchema)
            })
            val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
            val decoded = toSpark(reader.read(null, dec), structType).asInstanceOf[Row]
            Iterator.single(Row.fromSeq(passIdx.map(row.get) ++ decoded.toSeq))
        }
      }
    }(enc)
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
