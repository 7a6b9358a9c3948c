package graft.sink

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.zip.GZIPInputStream
import scala.collection.mutable.ArrayBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's FileWriterTest.java:107-174 (roll-by-size
  * counts, residual open file, gzip round-trip) plus timer flush,
  * per-record roll, naming, and abort/rollback.
  */
class RollingFileWriterSpec extends AnyFunSuite {
  private def tmp(): String = Files.createTempDirectory("rfw-test").toString
  // 10-char payload + newline = 11 bytes/record on the wire
  private def rec(i: Long, payload: String = null): SinkRecord =
    SinkRecord("topicA", 3, i, null,
      (if (payload == null) f"""{"n":$i%04d}""" else payload).getBytes(UTF_8))

  private def gunzip(path: String): String =
    new String(new GZIPInputStream(Files.newInputStream(Path.of(path))).readAllBytes(), UTF_8)

  test("rolls by uncompressed size; residual stays open until close") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val contents = ArrayBuffer.empty[String]
    val w = new RollingFileWriter(tmp(), "topicA", 3, JsonLinesWriter,
      flushSizeBytes = 100, flushIntervalMs = 300000,
      onRoll = f => { rolls += f; contents += gunzip(f.path) })
    // 11 bytes/record; roll when count > 100 => 10 records/file
    (0L until 25L).foreach(i => w.write(rec(i)))
    assert(rolls.size == 2, "2 full files rolled, 5 records residual")
    assert(rolls.forall(_.numRecords == 10))
    assert(rolls.forall(_.rawBytes > 100))
    assert(w.isDirty, "residual records keep the writer dirty")
    w.close()
    assert(rolls.size == 3 && rolls.last.numRecords == 5)
    // gzip round-trip: every payload byte survives, in order
    assert(contents.mkString == (0L until 25L).map(i => f"""{"n":$i%04d}""" + "\n").mkString)
  }

  test("flushIntervalMs == 0 rolls after every record") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 0, onRoll = rolls += _)
    (0L until 4L).foreach(i => w.write(rec(i)))
    w.close()
    assert(rolls.size == 4 && rolls.forall(_.numRecords == 1))
  }

  test("rollEveryRecord forces one file per record (avro-as-bytes)") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val w = new RollingFileWriter(tmp(), "t", 0, BytesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 300000, onRoll = rolls += _,
      rollEveryRecord = true)
    (0L until 3L).foreach(i => w.write(rec(i)))
    w.close()
    assert(rolls.size == 3)
  }

  test("timer flushes a dirty file after flushIntervalMs") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 150, onRoll = rolls += _)
    w.write(rec(7))
    assert(rolls.isEmpty, "not yet — interval hasn't elapsed")
    val deadline = System.nanoTime() + 5_000_000_000L
    while (rolls.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
    assert(rolls.size == 1 && rolls.head.numRecords == 1)
    assert(!w.isDirty)
    w.close()
    assert(rolls.size == 1, "close after timer flush must not re-ingest")
  }

  test("staged file names follow kafka_{topic}_{partition}_{offset}.{ext}.gz") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val w = new RollingFileWriter(tmp(), "topicA", 3, JsonLinesWriter,
      flushSizeBytes = 100, flushIntervalMs = 300000, onRoll = rolls += _)
    (5L until 30L).foreach(i => w.write(rec(i)))
    w.close()
    val names = rolls.map(f => Path.of(f.path).getFileName.toString)
    assert(names.head == "kafka_topicA_3_5.json.gz", s"got $names")
    assert(names.forall(_.matches("kafka_topicA_3_\\d+\\.json\\.gz")))
    // first offset of each file = last offset of that file - its record count + 1
    assert(rolls.map(_.firstOffset) == rolls.map(f => f.lastOffset - f.numRecords + 1))
  }

  test("records retained only when DLQ enabled") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val on = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter, 100, 300000,
      onRoll = rolls += _, retainRecords = true)
    (0L until 12L).foreach(i => on.write(rec(i)))
    on.close()
    assert(rolls.flatMap(_.records).map(_.offset) == (0L until 12L))
    rolls.clear()
    val off = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter, 100, 300000,
      onRoll = rolls += _, retainRecords = false)
    (0L until 12L).foreach(i => off.write(rec(i)))
    off.close()
    assert(rolls.forall(_.records.isEmpty))
  }

  test("abort discards the in-flight file without ingesting (rollback)") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter, 1 << 20, 300000,
      onRoll = rolls += _)
    w.write(rec(0))
    val dir = w.dir
    w.abort()
    assert(rolls.isEmpty, "no ingest after abort")
    assert(!Files.exists(dir) || Files.list(dir).count() == 0)
    assertThrows[IllegalStateException](w.write(rec(1)))
  }

  test("timer-flush ingest failure with no subsequent write fails close()") {
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 100,
      onRoll = _ => throw new RuntimeException("ingest down"))
    w.write(rec(0))
    val deadline = System.nanoTime() + 5_000_000_000L
    while (w.isDirty && System.nanoTime() < deadline) Thread.sleep(20)
    Thread.sleep(50) // let the timer thread finish the failing dispatch
    val e = intercept[IllegalStateException](w.close())
    assert(e.getMessage.contains("ingest down"))
  }

  test("timed flush does not block concurrent writes during a slow ingest") {
    val rolls = ArrayBuffer.empty[StagedFile]
    val ingestGate = new java.util.concurrent.CountDownLatch(1)
    val ingestStarted = new java.util.concurrent.CountDownLatch(1)
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 100,
      onRoll = f => { ingestStarted.countDown(); ingestGate.await(); rolls += f })
    w.write(rec(0))
    assert(ingestStarted.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "timer flush should have started the ingest")
    // ingest is parked inside onRoll on the timer thread; writes must proceed
    val t0 = System.nanoTime()
    (1L until 5L).foreach(i => w.write(rec(i)))
    val writeMs = (System.nanoTime() - t0) / 1_000_000
    ingestGate.countDown()
    w.close()
    assert(writeMs < 2000, s"writes blocked ${writeMs}ms behind the parked ingest")
    assert(rolls.map(_.numRecords).sum == 5)
  }

  test("close() barriers on an in-flight timer dispatch and surfaces its failure") {
    val ingestStarted = new java.util.concurrent.CountDownLatch(1)
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 1 << 20, flushIntervalMs = 100,
      onRoll = _ => { ingestStarted.countDown(); Thread.sleep(300); throw new RuntimeException("ingest down") })
    w.write(rec(0))
    assert(ingestStarted.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // dispatch is in flight on the timer thread RIGHT NOW — no sleep:
    // close() must block on the dispatch barrier, observe the recorded
    // error, and fail the batch (the pre-fix writer returned success here
    // and the ingest failure was silently swallowed after offsets commit)
    val e = intercept[IllegalStateException](w.close())
    assert(e.getMessage.contains("ingest down"))
  }

  test("staged files reach ingest in offset order when timer and task threads race") {
    val order = ArrayBuffer.empty[Long]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ingestStarted = new java.util.concurrent.CountDownLatch(1)
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter,
      flushSizeBytes = 100, flushIntervalMs = 100,
      onRoll = f => {
        order.synchronized(order += f.firstOffset)
        if (f.firstOffset == 0) { ingestStarted.countDown(); gate.await() }
      })
    w.write(rec(0)) // timer will stage this file (firstOffset 0)
    assert(ingestStarted.await(5, java.util.concurrent.TimeUnit.SECONDS))
    // timer thread is parked inside onRoll holding the dispatch lock; the
    // task thread now rolls two MORE files by size — they must queue
    // behind the timer's file, not jump ahead of offset 0
    (1L until 21L).foreach(i => w.write(rec(i)))
    gate.countDown()
    w.close()
    assert(order.toSeq == Seq(0L, 1L, 11L),
      s"ingest order must be staging (offset) order, got $order")
  }

  test("staged file is deleted after the roll callback completes") {
    var seen: String = null
    val w = new RollingFileWriter(tmp(), "t", 0, JsonLinesWriter, 100, 300000,
      onRoll = f => { seen = f.path; assert(Files.exists(Path.of(f.path))) })
    (0L until 12L).foreach(i => w.write(rec(i)))
    w.close()
    assert(seen != null && !Files.exists(Path.of(seen)))
  }
}
