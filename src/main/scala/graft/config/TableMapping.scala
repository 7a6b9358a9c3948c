package graft.config

/** One topic→(db, table, format, mapping, streaming) routing entry — the
  * engine's "catalog" record.
  *
  * Semantics mirror the reference's mapping config
  * (reference: src/main/java/.../TopicToTableMapping.java:20-25,92-117):
  * db/table/mapping identifiers are allowlist-validated so a mapping can
  * never smuggle KQL metacharacters (`;`, `'`, `|`) into an emitted
  * control command, and format names are alphanumeric-only.
  */
final case class TableMapping(
    topic: String,
    db: String,
    table: String,
    format: String = "json",
    mapping: Option[String] = None,
    streaming: Boolean = false,
    /** Avro writer schema JSON for the value. With `format=avro`: present
      * ⇒ values are Avro binary datums framed into an object-container
      * file per staged file; absent ⇒ each value is a complete Avro
      * container (avro-as-bytes) and the writer rolls per record, because
      * concatenated containers inside one gzip are unreadable
      * (reference: FileWriter.java:298-301,321-323). */
    valueSchema: Option[String] = None) {

  /** Throws [[SinkConfigException]] on the first invalid field. */
  def validated: TableMapping = {
    def requireNonEmpty(field: String, v: String): Unit =
      if (v == null || v.isEmpty)
        throw new SinkConfigException(s"'$field' must be provided for each mapping")
    requireNonEmpty("topic", topic)
    requireNonEmpty("db", db)
    requireNonEmpty("table", table)
    TableMapping.requireIdentifier("db", db)
    TableMapping.requireIdentifier("table", table)
    mapping.filter(_.nonEmpty).foreach(TableMapping.requireIdentifier("mapping", _))
    if (format.nonEmpty && !TableMapping.FormatPattern.matches(format))
      throw new SinkConfigException(
        s"'format' contains invalid characters: '$format'. Only alphanumeric characters are allowed.")
    this
  }
}

object TableMapping {
  /** Valid Kusto entity names: alphanumerics, underscore, hyphen, dot.
    * Anything else (quotes, semicolons, pipes, whitespace) is rejected. */
  val IdentifierPattern = "^[a-zA-Z0-9_.\\-]+$".r
  /** Valid ingestion format names: alphanumerics only. */
  val FormatPattern = "^[a-zA-Z0-9]+$".r

  private def requireIdentifier(field: String, value: String): Unit =
    if (!IdentifierPattern.matches(value))
      throw new SinkConfigException(
        s"'$field' contains invalid characters: '$value'. Only alphanumeric " +
          "characters, underscores, hyphens, and dots are allowed.")

  /** Parse the mapping array from its JSON config form. Accepts
    * single-quoted JSON (the reference enables Jackson ALLOW_SINGLE_QUOTES,
    * reference: KustoSinkConfig.java:113) because connector configs are
    * typically embedded inside double-quoted JSON property files.
    */
  def parseList(json: String): Seq[TableMapping] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.core.json.JsonReadFeature
    import scala.jdk.CollectionConverters._
    val mapper = new ObjectMapper()
      .configure(JsonReadFeature.ALLOW_SINGLE_QUOTES.mappedFeature(), true)
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new SinkConfigException(s"kusto.tables.topics.mapping is not valid JSON: ${e.getMessage}")
      }
    if (!root.isArray)
      throw new SinkConfigException("kusto.tables.topics.mapping must be a JSON array")
    root.elements().asScala.map { n =>
      def str(f: String): Option[String] = Option(n.get(f)).filterNot(_.isNull).map(_.asText)
      TableMapping(
        topic = str("topic").getOrElse(""),
        db = str("db").getOrElse(""),
        table = str("table").getOrElse(""),
        format = str("format").getOrElse("json").toLowerCase,
        mapping = str("mapping").filter(_.nonEmpty),
        streaming = Option(n.get("streaming")).exists(v => v.asBoolean(false) || v.asText == "true"),
        valueSchema = str("valueSchema").filter(_.nonEmpty)
      ).validated
    }.toSeq
  }
}

/** Config-time validation failure (the engine's analog of Kafka's
  * ConfigException). */
final class SinkConfigException(msg: String) extends RuntimeException(msg)
