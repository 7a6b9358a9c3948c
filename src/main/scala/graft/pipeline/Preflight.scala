package graft.pipeline

import graft.config.{SinkConfig, TableMapping}

/** Metadata surface the startup validator probes — a real deployment
  * backs this with the cluster's admin endpoint (the reference issues the
  * KQL probes `.show table … mapping`, `.show principal access`,
  * `.show … policy streamingingestion`; SURVEY §2.2 Q9-Q11); tests use a
  * scripted stub. */
trait MetadataClient {
  def tableExists(db: String, table: String): Boolean
  def mappingExists(db: String, table: String, format: String, mapping: String): Boolean
  def hasIngestPermission(db: String, table: String): Boolean
  def streamingPolicyEnabled(db: String, table: String): Boolean
}

final class PreflightException(val errors: Seq[String])
  extends RuntimeException(s"startup validation failed:\n${errors.mkString("\n")}")

/** V1 — fail-fast startup validation, run before `query.start()`: every
  * mapping's table must exist and be ingestible, named ingestion mappings
  * must exist for the mapping's format, and streaming-mode mappings need
  * the streaming ingestion policy enabled. ALL errors are collected (not
  * first-failure) so one restart fixes the whole config — mirroring the
  * reference's error-list collection
  * (reference: KustoSinkTask.java:212-307,342-387).
  */
object Preflight {

  /** Streaming ingestion caps a single request at 4 MB (reference
    * guidance: README.md:427-429) — a larger roll target would make
    * every streaming ingest oversized and fall back to queued, silently
    * defeating the mode the mapping asked for. Caught at startup. */
  val StreamingMaxFlushBytes: Long = 4L * 1024 * 1024

  /** Config-local checks (flush cap, Avro schema parse) ALWAYS run —
    * they need no cluster round trip. The metadata probes (table /
    * mapping / permission / streaming policy) run only when the config
    * opts in via `kusto.validation.table.enable`, the reference's
    * default-off stance (KustoSinkTask.java:345-355: probes gated on
    * getEnableTableValidation()). */
  def validate(config: SinkConfig, client: MetadataClient): Unit = {
    val flushErrors =
      if (config.flushSizeBytes > StreamingMaxFlushBytes)
        config.mappings.filter(_.streaming).map(m =>
          s"flushSizeBytes ${config.flushSizeBytes} exceeds the 4 MB streaming ingestion cap " +
            s"(topic '${m.topic}' → ${m.db}.${m.table} requests streaming)")
      else Nil
    val schemaErrors = config.mappings.flatMap(schemaCheck)
    val metaErrors =
      if (config.enableTableValidation)
        config.mappings.flatMap(validateMapping(_, client))
      else Nil
    val errors = flushErrors ++ schemaErrors ++ metaErrors
    if (errors.nonEmpty) throw new PreflightException(errors)
  }

  /** A malformed Avro value schema must fail at startup, not mid-stream. */
  private def schemaCheck(m: TableMapping): Option[String] =
    m.valueSchema.flatMap { json =>
      try { new org.apache.avro.Schema.Parser().parse(json); None }
      catch { case e: Exception =>
        Some(s"valueSchema for topic '${m.topic}' is not a valid Avro schema: ${e.getMessage}")
      }
    }

  private def validateMapping(m: TableMapping, client: MetadataClient): Seq[String] = {
    val id = s"${m.db}.${m.table}"
    if (!client.tableExists(m.db, m.table))
      return Seq(s"table $id does not exist or is not accessible (topic '${m.topic}')")
    val mappingErr = m.mapping.filter(_.nonEmpty).collect {
      case name if !client.mappingExists(m.db, m.table, m.format, name) =>
        s"ingestion mapping '$name' (format ${m.format}) not found on $id"
    }
    val permErr =
      if (!client.hasIngestPermission(m.db, m.table))
        Some(s"principal lacks ingest permission on $id")
      else None
    val streamErr =
      if (m.streaming && !client.streamingPolicyEnabled(m.db, m.table))
        Some(s"streaming ingestion policy is not enabled on $id but mapping for topic '${m.topic}' requests streaming")
      else None
    mappingErr.toSeq ++ permErr ++ streamErr
  }
}
