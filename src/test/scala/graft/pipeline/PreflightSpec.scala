package graft.pipeline

import graft.config.{SinkConfig, TableMapping}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's validateTableMappings error collection
  * (KustoSinkTask.java:212-307,342-387). */
class PreflightSpec extends AnyFunSuite {
  private final class Stub(
      tables: Set[(String, String)] = Set(("db", "t1"), ("db", "t2")),
      mappings: Set[String] = Set("Map1"),
      ingestOk: Set[(String, String)] = Set(("db", "t1"), ("db", "t2")),
      streamingOk: Set[(String, String)] = Set(("db", "t1"))) extends MetadataClient {
    def tableExists(db: String, table: String) = tables(db -> table)
    def mappingExists(db: String, table: String, format: String, mapping: String) = mappings(mapping)
    def hasIngestPermission(db: String, table: String) = ingestOk(db -> table)
    def streamingPolicyEnabled(db: String, table: String) = streamingOk(db -> table)
  }

  private def cfg(ms: TableMapping*) =
    SinkConfig(mappings = ms, enableTableValidation = true)

  test("metadata probes are opt-in: default config skips them (reference default-off)") {
    // ghost table, but kusto.validation.table.enable is unset → no probe
    Preflight.validate(
      SinkConfig(mappings = Seq(TableMapping("a", "db", "ghost"))), new Stub())
    // the config-local Avro schema check still runs with validation off
    val e = intercept[PreflightException](Preflight.validate(
      SinkConfig(mappings = Seq(
        TableMapping("a", "db", "t1", format = "avro", valueSchema = Some("{not avro}")))),
      new Stub()))
    assert(e.errors.exists(_.contains("valueSchema")))
  }

  test("healthy config passes") {
    Preflight.validate(cfg(
      TableMapping("a", "db", "t1", mapping = Some("Map1"), streaming = true),
      TableMapping("b", "db", "t2")), new Stub())
  }

  test("missing table reported per-topic") {
    val e = intercept[PreflightException](
      Preflight.validate(cfg(TableMapping("a", "db", "ghost")), new Stub()))
    assert(e.errors.exists(m => m.contains("db.ghost") && m.contains("'a'")))
  }

  test("malformed Avro valueSchema fails at startup; a valid one passes") {
    val good = """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}"""
    Preflight.validate(cfg(
      TableMapping("a", "db", "t1", format = "avro", valueSchema = Some(good))), new Stub())
    val e = intercept[PreflightException](Preflight.validate(cfg(
      TableMapping("a", "db", "t1", format = "avro", valueSchema = Some("{not avro}"))), new Stub()))
    assert(e.errors.exists(m => m.contains("valueSchema") && m.contains("'a'")))
  }

  test("streaming mapping with flushSizeBytes over the 4 MB cap fails at startup") {
    // over-cap + streaming: caught, named per streaming mapping only
    val e = intercept[PreflightException](Preflight.validate(
      SinkConfig(mappings = Seq(
        TableMapping("a", "db", "t1", streaming = true),
        TableMapping("b", "db", "t2")), flushSizeBytes = 8L * 1024 * 1024), new Stub()))
    assert(e.errors.size == 1)
    assert(e.errors.head.contains("4 MB streaming ingestion cap") && e.errors.head.contains("'a'"))
    // over-cap without streaming mappings: fine (queued ingestion has no such cap)
    Preflight.validate(SinkConfig(mappings = Seq(TableMapping("b", "db", "t2")),
      flushSizeBytes = 8L * 1024 * 1024), new Stub())
    // streaming at exactly the cap: fine
    Preflight.validate(SinkConfig(mappings = Seq(TableMapping("a", "db", "t1", streaming = true)),
      flushSizeBytes = Preflight.StreamingMaxFlushBytes), new Stub())
  }

  test("all errors collected in one pass: mapping, permission, streaming policy") {
    val client = new Stub(ingestOk = Set(("db", "t1")), streamingOk = Set.empty)
    val e = intercept[PreflightException](Preflight.validate(cfg(
      TableMapping("a", "db", "t1", mapping = Some("NoSuchMap")),
      TableMapping("b", "db", "t2", streaming = true)), client))
    assert(e.errors.size == 3, s"expected 3 errors, got: ${e.errors}")
    assert(e.errors.exists(_.contains("NoSuchMap")))
    assert(e.errors.exists(_.contains("ingest permission")))
    assert(e.errors.exists(_.contains("streaming ingestion policy")))
  }
}
