package graft.ingest

import graft.sink.StagedFile
import org.scalatest.funsuite.AnyFunSuite

class ManagedStreamingSpec extends AnyFunSuite {
  private val target = IngestTarget("db", "t", "json", streaming = true)
  private def file(bytes: Long) = StagedFile("/tmp/f.json.gz", 1, bytes, 0, 0, Nil)

  private final class Scripted(var behavior: Int => IngestionStatus) extends IngestClient {
    var calls = 0
    var targets = List.empty[IngestTarget]
    def ingest(f: StagedFile, t: IngestTarget): IngestionStatus = {
      calls += 1; targets ::= t; behavior(calls)
    }
  }

  test("healthy streaming path never touches the queued client") {
    val s = new Scripted(_ => IngestionStatus.Succeeded)
    val q = new Scripted(_ => IngestionStatus.Queued)
    val c = new ManagedStreamingIngestClient(s, q)
    assert(c.ingest(file(100), target) == IngestionStatus.Succeeded)
    assert(s.calls == 1 && q.calls == 0)
  }

  test("payload above the streaming cap goes straight to queued") {
    val s = new Scripted(_ => IngestionStatus.Succeeded)
    val q = new Scripted(_ => IngestionStatus.Queued)
    val c = new ManagedStreamingIngestClient(s, q, maxStreamingBytes = 1024)
    assert(c.ingest(file(2048), target) == IngestionStatus.Queued)
    assert(s.calls == 0 && q.calls == 1)
    assert(!q.targets.head.streaming, "fallback must request the queued path")
  }

  test("transient streaming failures retry then fall back to queued") {
    val s = new Scripted(_ => throw new TransientIngestException("glitch"))
    val q = new Scripted(_ => IngestionStatus.Queued)
    val c = new ManagedStreamingIngestClient(s, q, streamingAttempts = 3)
    assert(c.ingest(file(10), target) == IngestionStatus.Queued)
    assert(s.calls == 3 && q.calls == 1)
  }

  test("Failed streaming status consumes attempts then falls back") {
    val s = new Scripted(_ => IngestionStatus.Failed)
    val q = new Scripted(_ => IngestionStatus.Succeeded)
    val c = new ManagedStreamingIngestClient(s, q, streamingAttempts = 2)
    assert(c.ingest(file(10), target) == IngestionStatus.Succeeded)
    assert(s.calls == 2 && q.calls == 1)
  }

  test("final-but-lossy streaming statuses are returned as-is, no fallback") {
    for (st <- Seq(IngestionStatus.Skipped, IngestionStatus.PartiallySucceeded)) {
      val s = new Scripted(_ => st)
      val q = new Scripted(_ => IngestionStatus.Queued)
      val c = new ManagedStreamingIngestClient(s, q)
      assert(c.ingest(file(10), target) == st)
      assert(q.calls == 0, s"$st is final — the queued path must not run")
    }
  }

  test("permanent errors fail fast without fallback") {
    val s = new Scripted(_ => throw new PermanentIngestException("bad schema"))
    val q = new Scripted(_ => IngestionStatus.Queued)
    val c = new ManagedStreamingIngestClient(s, q)
    assertThrows[PermanentIngestException](c.ingest(file(10), target))
    assert(q.calls == 0)
  }
}
