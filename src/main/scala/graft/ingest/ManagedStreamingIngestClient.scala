package graft.ingest

import graft.sink.StagedFile

/** Streaming ingestion with managed fallback to queued — the engine's
  * K2: small batches go through the low-latency streaming endpoint; when
  * streaming fails transiently `streamingAttempts` times, or the payload
  * exceeds the streaming size cap, the SAME staged file falls back to the
  * queued path so data is never lost and never blocks on a degraded
  * streaming endpoint.
  *
  * Mirrors the reference's ManagedStreamingIngestClient selection +
  * fallback semantics (reference: KustoSinkTask.java:322-328 client
  * creation, README.md:427-431 the ≤4 MB streaming guidance) — permanent
  * streaming errors still fail fast (reference:
  * TopicPartitionWriter.java:130-140).
  */
final class ManagedStreamingIngestClient(
    streaming: IngestClient,
    queued: IngestClient,
    streamingAttempts: Int = 3,
    maxStreamingBytes: Long = 4L * 1024 * 1024) extends IngestClient {

  def ingest(file: StagedFile, target: IngestTarget): IngestionStatus = {
    if (file.rawBytes > maxStreamingBytes)
      return queued.ingest(file, target.copy(streaming = false))
    var attempt = 0
    while (attempt < streamingAttempts) {
      attempt += 1
      try {
        val status = streaming.ingest(file, target)
        // A *final* streaming verdict (incl. lossy Skipped/PartiallySucceeded)
        // is returned as-is; only Failed falls through to another attempt.
        if (status != IngestionStatus.Failed) return status
      } catch {
        case _: TransientIngestException if attempt < streamingAttempts => // retry streaming
        case _: TransientIngestException => return queued.ingest(file, target.copy(streaming = false))
        // PermanentIngestException propagates — fail fast, no fallback
      }
    }
    queued.ingest(file, target.copy(streaming = false))
  }

  override def close(): Unit = { streaming.close(); queued.close() }
}
