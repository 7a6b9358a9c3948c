package graft.ingest

import graft.config.ErrorBehavior
import graft.pipeline.SinkMetrics
import graft.sink.{SinkRecord, StagedFile}
import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's TopicPartitionWriterTest.java:93-113 (ingest
  * call capture), :223-257 (offset bookkeeping), :317-358 (DLQ), plus the
  * streaming status table of TopicPartitionWriter.java:150-176.
  */
class IngestPipeSpec extends AnyFunSuite {
  private val target = IngestTarget("db", "tbl", "json")
  private def staged(first: Long, last: Long) = StagedFile(
    "/tmp/fake.json.gz", last - first + 1, 42, first, last,
    (first to last).map(o => SinkRecord("t", 0, o, null, s"v$o".getBytes(UTF_8))))

  private def pipe(id: String, behavior: ErrorBehavior = ErrorBehavior.Fail,
                   dlq: Option[DlqProducer] = None, maxTime: Long = 30, backoff: Long = 10,
                   metrics: SinkMetrics = SinkMetrics.local()) =
    new IngestPipe(new MockIngestClient(id), target,
      RetryPolicy(maxTime, backoff, sleeper = _ => ()), behavior, dlq, metrics)

  test("success advances lastCommittedOffset to the file's last offset") {
    val st = MockIngestClient.reset("ok")
    val p = pipe("ok")
    assert(p.lastCommittedOffset == -1L)
    p.handleRoll(staged(0, 9))
    assert(p.lastCommittedOffset == 9L)
    assert(st.callCount == 1)
    assert(st.targets.head == target)
  }

  test("transient failures are retried with backoff until success") {
    val st = MockIngestClient.reset("retry2")
    st.failFirst = 2
    val m = SinkMetrics.local()
    val p = pipe("retry2", maxTime = 30, backoff = 10, metrics = m) // 4 attempts budget
    p.handleRoll(staged(0, 4))
    assert(st.callCount == 3, "2 failures + 1 success")
    assert(p.lastCommittedOffset == 4L)
    assert(m.ingestionAttempts.value == 3 && m.ingestionSuccesses.value == 1)
    assert(m.ingestionFailures.value == 0)
  }

  test("exhausted retries throw and never advance the offset") {
    val st = MockIngestClient.reset("dead")
    st.failFirst = Int.MaxValue
    val m = SinkMetrics.local()
    val p = pipe("dead", maxTime = 30, backoff = 10, metrics = m)
    assertThrows[IngestExhaustedException](p.handleRoll(staged(0, 4)))
    assert(p.lastCommittedOffset == -1L, "offset gate: nothing committed")
    assert(st.callCount == 4, "maxRetryTime/backoff + 1 = 4 attempts")
    assert(m.ingestionFailures.value == 1)
  }

  test("DLQ receives the file's records on exhaustion in LOG mode, not FAIL mode") {
    val st = MockIngestClient.reset("dlq1"); st.failFirst = Int.MaxValue
    InMemoryDlq.reset("d1")
    val m = SinkMetrics.local()
    val p = pipe("dlq1", ErrorBehavior.Log, Some(new InMemoryDlq("d1")), metrics = m)
    assertThrows[IngestExhaustedException](p.handleRoll(staged(3, 5)))
    val sent = InMemoryDlq.state("d1")
    assert(sent.size == 3)
    assert(new String(sent.get(0)._1, UTF_8).contains("offset=3"))
    assert(new String(sent.get(0)._2, UTF_8) == "v3")
    assert(m.dlqRecordsSent.value == 3)

    val st2 = MockIngestClient.reset("dlq2"); st2.failFirst = Int.MaxValue
    InMemoryDlq.reset("d2")
    val pf = pipe("dlq2", ErrorBehavior.Fail, Some(new InMemoryDlq("d2")))
    assertThrows[IngestExhaustedException](pf.handleRoll(staged(3, 5)))
    assert(InMemoryDlq.state("d2").isEmpty, "FAIL mode never dead-letters")
  }

  test("streaming statuses: Succeeded/Queued/Pending accepted; Failed retried") {
    for (s <- Seq(IngestionStatus.Succeeded, IngestionStatus.Queued, IngestionStatus.Pending)) {
      val st = MockIngestClient.reset("st"); st.status = s
      val p = pipe("st")
      p.handleRoll(staged(0, 1))
      assert(p.lastCommittedOffset == 1L, s"$s must advance the offset")
      assert(st.callCount == 1)
    }
    val st = MockIngestClient.reset("fail"); st.status = IngestionStatus.Failed
    val p = pipe("fail")
    assertThrows[IngestExhaustedException](p.handleRoll(staged(0, 1)))
    assert(st.callCount == 4, "Failed status consumes the retry budget")
  }

  test("Skipped/PartiallySucceeded are final: no retry, no DLQ, offset advances") {
    for (s <- Seq(IngestionStatus.Skipped, IngestionStatus.PartiallySucceeded)) {
      val st = MockIngestClient.reset("lossy"); st.status = s
      InMemoryDlq.reset("dl")
      val p = pipe("lossy", ErrorBehavior.Log, Some(new InMemoryDlq("dl")))
      p.handleRoll(staged(0, 2))
      assert(st.callCount == 1, s"$s is final — no retry")
      assert(InMemoryDlq.state("dl").isEmpty, s"$s is final — no DLQ")
      assert(p.lastCommittedOffset == 2L)
    }
  }

  test("permanent failures fail fast without consuming the retry budget") {
    val m = SinkMetrics.local()
    val client = new IngestClient {
      var calls = 0
      def ingest(f: StagedFile, t: IngestTarget): IngestionStatus = {
        calls += 1; throw new PermanentIngestException("bad mapping")
      }
    }
    val p = new IngestPipe(client, target, RetryPolicy(1000, 10, _ => ()),
      ErrorBehavior.Fail, None, m)
    assertThrows[IngestExhaustedException](p.handleRoll(staged(0, 0)))
    assert(m.ingestionAttempts.value == 1 && m.ingestionFailures.value == 1)
  }
}
