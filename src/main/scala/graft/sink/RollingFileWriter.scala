package graft.sink

import java.io.{BufferedOutputStream, File, FileOutputStream, OutputStream}
import java.nio.file.{Files, Path}
import java.util.{Timer, TimerTask, UUID}
import java.util.zip.GZIPOutputStream

/** A rolled (finished) staging file, handed to the ingest callback.
  * `rawBytes` counts UNCOMPRESSED payload bytes — roll thresholds are
  * defined pre-compression (reference: FileWriter.java:30-33,298-301).
  * `records` is retained only when the DLQ is enabled, so a failed ingest
  * can replay per-record without holding every batch in memory otherwise
  * (reference: FileWriter.java:293-295).
  */
final case class StagedFile(
    path: String,
    numRecords: Long,
    rawBytes: Long,
    firstOffset: Long,
    lastOffset: Long,
    records: Seq[SinkRecord])

/** Counts bytes written pre-compression; wraps the stream INSIDE the gzip
  * layer so `count` is the uncompressed size
  * (reference: FileWriter.java:146-153,332-362). */
final class CountingOutputStream(under: OutputStream) extends OutputStream {
  var count: Long = 0L
  override def write(b: Int): Unit = { under.write(b); count += 1 }
  override def write(b: Array[Byte]): Unit = { under.write(b); count += b.length }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = { under.write(b, off, len); count += len }
  override def flush(): Unit = under.flush()
  override def close(): Unit = under.close()
}

/** Size-OR-time rolling gzip staging writer for one (topic, partition).
  *
  * This is the one behavior Spark does not provide declaratively
  * (SURVEY §4): roll a staged file when its uncompressed size exceeds
  * `flushSizeBytes`, OR when `flushIntervalMs` elapses since the file was
  * opened, whichever comes first; `flushIntervalMs == 0` rolls after every
  * record; `rollEveryRecord` forces one file per record (avro-as-bytes,
  * reference: FileWriter.java:298-301,321-323).
  *
  * Files are named `kafka_{topic}_{partition}_{firstOffset}.{ext}.gz`
  * inside a per-writer UUID temp dir (reference:
  * TopicPartitionWriter.java:85-89,235-242) — deterministic names make
  * retried ingests idempotent on the Kusto side and debuggable on disk.
  *
  * Thread model: inside a Spark task a partition is single-threaded, but
  * the flush timer fires on its own thread, so state transitions are
  * `synchronized` (the reference uses a fair RW lock for the same race,
  * reference: FileWriter.java:82-83,262). The writer monitor covers only
  * file rotation — finished files are ENQUEUED under the monitor (so queue
  * order is staging order is offset order) and the `onRoll` callback
  * (which may run a long retrying ingest) drains the queue OUTSIDE it,
  * serialized on a dedicated dispatch lock: whichever thread wins the lock
  * dispatches in queue order and the loser finds an empty queue, so ingest
  * order is offset order even when the timer and task threads race. A
  * timer-flush failure is recorded under the dispatch lock and rethrown on
  * the next write (reference: FileWriter.java:280-282) and, if no write
  * follows, on `close()` — which barriers on the dispatch lock first, so a
  * tail-of-partition timer failure still fails the batch before offsets
  * commit.
  */
final class RollingFileWriter(
    baseTempDir: String,
    topic: String,
    partition: Int,
    provider: FormatWriterProvider,
    flushSizeBytes: Long,
    flushIntervalMs: Long,
    onRoll: StagedFile => Unit,
    retainRecords: Boolean = false,
    rollEveryRecord: Boolean = false) extends AutoCloseable {

  val dir: Path = {
    val p = Path.of(baseTempDir, s"kusto-sink-${UUID.randomUUID()}")
    Files.createDirectories(p)
    p
  }

  private var out: CountingOutputStream = _
  private var gzip: GZIPOutputStream = _
  private var appender: RecordAppender = _
  private var file: File = _
  private var numRecords = 0L
  /** Payload bytes handed to the appender. Block-buffering appenders
    * (Avro containers) hold bytes until a ~64 KB block completes, so
    * `out.count` can lag — size rolls and dirtiness use
    * max(out.count, rawAppended) to stay exact per record. */
  private var rawAppended = 0L
  private var firstOffset = -1L
  private var lastOffset = -1L
  private var retained = List.empty[SinkRecord]
  private var timer: Timer = _
  private var flushError: String = _
  private var stopped = false

  /** Number of rolled files (for tests/metrics). */
  var rolledFiles: Long = 0L

  def isDirty: Boolean = synchronized { out != null && (out.count > 0 || rawAppended > 0) }

  def filePath(offset: Long): String =
    dir.resolve(s"kafka_${topic}_${partition}_$offset.${provider.ext}.gz").toString

  def write(r: SinkRecord): Unit = {
    synchronized {
      if (flushError != null) throw new IllegalStateException(flushError)
      if (stopped) throw new IllegalStateException("writer is stopped")
      if (r == null) return
      if (out == null) openFile(r.offset)
      appender.append(r)
      if (r.value != null) rawAppended += r.value.length
      if (retainRecords) retained ::= r
      numRecords += 1
      lastOffset = r.offset
      if (flushIntervalMs == 0 || math.max(out.count, rawAppended) > flushSizeBytes || rollEveryRecord)
        finishLocked()
    }
    drainDispatch(barrier = false)
  }

  private def openFile(offset: Long): Unit = {
    file = new File(filePath(offset))
    firstOffset = offset
    val fileStream = new BufferedOutputStream(new FileOutputStream(file))
    gzip = new GZIPOutputStream(fileStream)
    out = new CountingOutputStream(gzip)
    appender = provider.open(out)
    armTimer()
  }

  private def armTimer(): Unit = {
    if (flushIntervalMs > 0) {
      if (timer != null) timer.cancel()
      timer = new Timer(true)
      timer.schedule(new TimerTask {
        def run(): Unit = flushByTime()
      }, flushIntervalMs)
    }
  }

  private def flushByTime(): Unit = {
    val fileName = synchronized { if (file == null) "[no file]" else file.getName }
    try {
      synchronized { if (!stopped && isDirty) finishLocked() }
      drainDispatch(barrier = false)
    } catch {
      case e: Exception => // drainDispatch already recorded it; staging errors recorded here
        synchronized {
          if (flushError == null)
            flushError = s"Error in timed flush of $fileName: ${e.getMessage}"
        }
    }
  }

  /** Finish the current file and hand it to `onRoll`. No-op if clean. */
  def roll(): Unit = {
    synchronized {
      if (out == null || (out.count == 0 && rawAppended == 0)) discardOpenFile()
      else finishLocked()
    }
    drainDispatch(barrier = true)
  }

  /** Closes out the current file under the monitor and enqueues it for
    * dispatch. Staging happens only under the monitor, so queue order IS
    * offset order — whichever thread drains next preserves it. */
  private def finishLocked(): Unit = {
    appender.close()
    gzip.finish()
    out.close()
    pending.addLast(StagedFile(file.getPath, numRecords, out.count, firstOffset, lastOffset, retained.reverse))
    resetState()
    rolledFiles += 1
  }

  /** Staged files awaiting ingest, FIFO in staging (= offset) order.
    * Guarded by the writer monitor; drained under `dispatchLock`. */
  private val pending = new java.util.ArrayDeque[StagedFile]()

  /** Runs the roll callback outside the writer monitor, serialized on
    * `dispatchLock` so files reach ingest strictly in queue (offset)
    * order even when the timer thread and the task thread race — the
    * loser of the lock returns and the winner drains everything. A
    * dispatch failure is recorded in `flushError` BEFORE the lock is
    * released, so a `close()` that barriers on `dispatchLock` is
    * guaranteed to observe it. Plain `write()`s that stage nothing see an
    * empty queue and never touch the lock, so they proceed concurrently
    * with a long-running timer ingest. */
  private val dispatchLock = new java.util.concurrent.locks.ReentrantLock

  /** `barrier = true` (roll/close) blocks until the lock is acquired —
    * guaranteeing any in-flight dispatch on another thread has completed
    * (and recorded its error) before returning. `barrier = false`
    * (write/timer) is opportunistic: if another thread holds the lock it
    * returns immediately — that holder re-checks the queue after
    * releasing (the loop below), so an enqueue that lost `tryLock` is
    * never stranded: enqueue happens-before the failed tryLock, which
    * happens-before the holder's unlock and its queue re-check. */
  private def drainDispatch(barrier: Boolean): Unit = {
    if (barrier) {
      dispatchLock.lock()
      try drainLocked() finally dispatchLock.unlock()
    }
    while (synchronized { !pending.isEmpty }) {
      if (!dispatchLock.tryLock()) return
      try drainLocked() finally dispatchLock.unlock()
    }
  }

  /** Dispatch queued files in FIFO order. Caller must hold dispatchLock. */
  private def drainLocked(): Unit = {
    var next = synchronized { pending.pollFirst() }
    while (next != null) {
      try {
        try onRoll(next)
        finally Files.deleteIfExists(Path.of(next.path)) // staging is transient; ingest has consumed or replayed it
      } catch {
        case e: Exception =>
          synchronized {
            if (flushError == null) flushError = s"Error dispatching ${next.path}: ${e.getMessage}"
          }
          throw e
      }
      next = synchronized { pending.pollFirst() }
    }
  }

  private def discardOpenFile(): Unit = {
    if (out != null) { out.close(); Files.deleteIfExists(file.toPath) }
    resetState()
  }

  private def resetState(): Unit = {
    out = null; gzip = null; appender = null; file = null
    numRecords = 0; rawAppended = 0; firstOffset = -1; lastOffset = -1; retained = Nil
    if (timer != null) { timer.cancel(); timer = null }
  }

  /** Flush any residual open file through `onRoll`, then stop. A pending
    * timer-flush error is rethrown here so a failure on the last file of a
    * partition (with no subsequent write to surface it) still fails the
    * batch before offsets commit. */
  def close(): Unit = {
    synchronized {
      if (isDirty) finishLocked() else discardOpenFile()
      stopped = true
      if (timer != null) { timer.cancel(); timer = null }
    }
    // Drains the residual file AND anything the timer staged but has not
    // dispatched yet; acquiring dispatchLock doubles as a barrier for an
    // in-flight timer dispatch (its error is recorded under the lock), so
    // the flushError check below cannot race past a failing tail flush.
    drainDispatch(barrier = true)
    synchronized {
      if (flushError != null) throw new IllegalStateException(flushError)
    }
    // best-effort temp dir cleanup (empty after roll deletes)
    try Files.deleteIfExists(dir) catch { case _: Exception => () }
  }

  /** Stop WITHOUT flushing — rollback semantics for graceful abort: the
    * in-flight file is deleted so no post-close ingest can happen
    * (reference: FileWriter.java:216-237 rollback). */
  def abort(): Unit = synchronized {
    stopped = true
    discardOpenFile()
    // rollback: staged-but-undispatched files must never reach ingest
    var f = pending.pollFirst()
    while (f != null) {
      try Files.deleteIfExists(Path.of(f.path)) catch { case _: Exception => () }
      f = pending.pollFirst()
    }
    if (timer != null) { timer.cancel(); timer = null }
    try Files.deleteIfExists(dir) catch { case _: Exception => () }
  }
}
