package graft.ingest

import graft.sink.StagedFile
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID

/** Ingest client that lands staged files under `root/{db}/{table}/` on
  * local disk — the offline stand-in for a real Kusto cluster. Each staged
  * gzip file becomes one immutable blob in the table directory, which a
  * verification query can read back (`spark.read.json` handles `.json.gz`
  * natively), so the full pipeline is observable end-to-end without any
  * network: stage → ingest → query what was ingested.
  */
final class LocalTableIngestClient(root: String) extends IngestClient {
  def ingest(file: StagedFile, target: IngestTarget): IngestionStatus = {
    val dir = Path.of(root, target.db, target.table)
    Files.createDirectories(dir)
    val src = Path.of(file.path)
    val name = src.getFileName.toString
    // Retried ingests of the same staged file overwrite (idempotent by
    // deterministic name); distinct files never collide thanks to the
    // offset-based naming.
    Files.copy(src, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    if (target.streaming) IngestionStatus.Succeeded else IngestionStatus.Queued
  }
}
