package graft.ingest

import graft.config.ErrorBehavior
import graft.pipeline.SinkMetrics
import graft.sink.{SinkRecord, StagedFile}
import java.nio.charset.StandardCharsets

/** Where permanently-failed records go (the reference produces to a Kafka
  * DLQ topic, reference: TopicPartitionWriter.java:210-233; here it is a
  * boundary trait so tests and non-Kafka deployments can plug in). */
trait DlqProducer extends Serializable {
  def send(key: Array[Byte], value: Array[Byte]): Unit
}

/** In-JVM DLQ for tests (same registry pattern as MockIngestClient). */
final class InMemoryDlq(id: String) extends DlqProducer {
  def send(key: Array[Byte], value: Array[Byte]): Unit =
    InMemoryDlq.state(id).add((key, value))
}
object InMemoryDlq {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.CopyOnWriteArrayList[(Array[Byte], Array[Byte])]]
  def state(id: String): java.util.concurrent.CopyOnWriteArrayList[(Array[Byte], Array[Byte])] =
    registry.computeIfAbsent(id, _ => new java.util.concurrent.CopyOnWriteArrayList)
  def reset(id: String): Unit = registry.remove(id)
}

/** Retry budget: constant backoff, attempts = maxRetryTimeMs/backoffMs + 1
  * (reference: KustoSinkConfig.java:474-477). `sleeper` is injectable so
  * tests don't wall-clock 300 s. */
final case class RetryPolicy(
    maxRetryTimeMs: Long,
    backoffMs: Long,
    sleeper: Long => Unit = RetryPolicy.defaultSleeper) {
  def maxAttempts: Int = (maxRetryTimeMs / math.max(backoffMs, 1L)).toInt + 1
}
object RetryPolicy {
  val defaultSleeper: Long => Unit = ms => Thread.sleep(ms)
}

/** Exhausted retries / permanent failure escalated to the caller — in
  * FAIL mode this fails the micro-batch so offsets never advance past
  * un-ingested data. */
final class IngestExhaustedException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Per-(topic,partition,target) ingestion orchestrator: the roll callback.
  *
  * Drives the retry loop with constant backoff, interprets streaming
  * ingestion statuses, advances `lastCommittedOffset` ONLY on success
  * (the at-least-once gate, reference: TopicPartitionWriter.java:91-148),
  * and dead-letters the file's retained records on exhaustion when the
  * error mode allows (reference: TopicPartitionWriter.java:178-233).
  */
final class IngestPipe(
    client: IngestClient,
    target: IngestTarget,
    retry: RetryPolicy,
    behaviorOnError: ErrorBehavior,
    dlq: Option[DlqProducer],
    metrics: SinkMetrics) extends Serializable {

  // executors each materialize their own logger on first use (slf4j
  // loggers are not serializable; stderr would be unreadable at fleet
  // scale)
  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[IngestPipe])

  /** Highest offset whose file has been accepted by the sink. Offsets at
    * or below this are safe to commit. */
  @volatile var lastCommittedOffset: Long = -1L

  def handleRoll(file: StagedFile): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      metrics.ingestionAttempts.inc()
      try {
        val status = client.ingest(file, target)
        if (IngestionStatus.accepted(status)) {
          if (IngestionStatus.finalButLossy(status)) {
            // Final-but-lossy states are logged and NOT retried/DLQ'd —
            // exact reference semantics (TopicPartitionWriter.java:161-175).
            log.warn("file {} finished with final status {}; " +
              "status is final — not retried, not dead-lettered", file.path, status)
          }
          lastCommittedOffset = file.lastOffset
          metrics.ingestionSuccesses.inc()
          done = true
        } else {
          // streaming returned Failed — counts as a retryable attempt
          backoffOrGiveUp(attempt, file, null)
        }
      } catch {
        case e: TransientIngestException =>
          backoffOrGiveUp(attempt, file, e)
        case e: PermanentIngestException =>
          metrics.ingestionFailures.inc()
          throw new IngestExhaustedException(s"permanent ingest failure for ${file.path}", e)
      }
    }
  }

  private def backoffOrGiveUp(attempt: Int, file: StagedFile, cause: Throwable): Unit = {
    if (attempt < retry.maxAttempts) {
      retry.sleeper(retry.backoffMs)
    } else {
      metrics.ingestionFailures.inc()
      if (dlq.isDefined && behaviorOnError != ErrorBehavior.Fail)
        file.records.foreach(sendToDlq)
      throw new IngestExhaustedException(
        s"retry attempts exhausted ($attempt of ${retry.maxAttempts}) ingesting ${file.path}", cause)
    }
  }

  def sendToDlq(r: SinkRecord): Unit = {
    metrics.dlqRecordsSent.inc()
    val key = s"Failed to sink record with kafka coordinates topic=${r.topic}, " +
      s"partition=${r.partition}, offset=${r.offset}.${r.headersDescription}"
    dlq.foreach(_.send(key.getBytes(StandardCharsets.UTF_8), r.value))
  }
}
