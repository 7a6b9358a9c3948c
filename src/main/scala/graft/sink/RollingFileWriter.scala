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
  * file rotation — the `onRoll` callback (which may run a long retrying
  * ingest) executes OUTSIDE it, serialized on a dedicated dispatch lock so
  * staged files still reach ingest in offset order while plain `write()`s
  * proceed concurrently with a timer-triggered ingest. A timer-flush
  * failure is stored and rethrown on the next write (reference:
  * FileWriter.java:280-282) and, if no write follows, on `close()` — a
  * tail-of-partition timer failure must still fail the batch.
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
  private var firstOffset = -1L
  private var lastOffset = -1L
  private var retained = List.empty[SinkRecord]
  private var timer: Timer = _
  private var flushError: String = _
  private var stopped = false

  /** Number of rolled files (for tests/metrics). */
  var rolledFiles: Long = 0L

  def isDirty: Boolean = synchronized { out != null && out.count > 0 }

  def filePath(offset: Long): String =
    dir.resolve(s"kafka_${topic}_${partition}_$offset.${provider.ext}.gz").toString

  def write(r: SinkRecord): Unit = {
    val staged = synchronized {
      if (flushError != null) throw new IllegalStateException(flushError)
      if (stopped) throw new IllegalStateException("writer is stopped")
      if (r == null) return
      if (out == null) openFile(r.offset)
      appender.append(r)
      if (retainRecords) retained ::= r
      numRecords += 1
      lastOffset = r.offset
      if (flushIntervalMs == 0 || out.count > flushSizeBytes || rollEveryRecord)
        finishLocked()
      else None
    }
    staged.foreach(dispatch)
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
    val staged =
      try synchronized { if (stopped || !isDirty) None else finishLocked() }
      catch {
        case e: Exception =>
          synchronized { flushError = s"Error in timed flush of $fileName: ${e.getMessage}" }
          None
      }
    try staged.foreach(dispatch)
    catch {
      case e: Exception =>
        synchronized { flushError = s"Error in timed flush of $fileName: ${e.getMessage}" }
    }
  }

  /** Finish the current file and hand it to `onRoll`. No-op if clean. */
  def roll(): Unit = {
    val staged = synchronized {
      if (out == null || out.count == 0) { discardOpenFile(); None } else finishLocked()
    }
    staged.foreach(dispatch)
  }

  /** Closes out the current file under the monitor; the returned file must
    * be handed to `dispatch` OUTSIDE the monitor. */
  private def finishLocked(): Option[StagedFile] = {
    appender.close()
    gzip.finish()
    out.close()
    val staged = StagedFile(file.getPath, numRecords, out.count, firstOffset, lastOffset, retained.reverse)
    resetState()
    rolledFiles += 1
    Some(staged)
  }

  /** Runs the roll callback outside the writer monitor. `dispatchLock`
    * keeps staged files in offset order through ingest without blocking
    * concurrent `write()`s. */
  private val dispatchLock = new Object
  private def dispatch(staged: StagedFile): Unit = dispatchLock.synchronized {
    try onRoll(staged)
    finally Files.deleteIfExists(Path.of(staged.path)) // staging is transient; ingest has consumed or replayed it
  }

  private def discardOpenFile(): Unit = {
    if (out != null) { out.close(); Files.deleteIfExists(file.toPath) }
    resetState()
  }

  private def resetState(): Unit = {
    out = null; gzip = null; appender = null; file = null
    numRecords = 0; firstOffset = -1; lastOffset = -1; retained = Nil
    if (timer != null) { timer.cancel(); timer = null }
  }

  /** Flush any residual open file through `onRoll`, then stop. A pending
    * timer-flush error is rethrown here so a failure on the last file of a
    * partition (with no subsequent write to surface it) still fails the
    * batch before offsets commit. */
  def close(): Unit = {
    val staged = synchronized {
      val s = if (isDirty) finishLocked() else { discardOpenFile(); None }
      stopped = true
      if (timer != null) { timer.cancel(); timer = null }
      s
    }
    staged.foreach(dispatch)
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
    if (timer != null) { timer.cancel(); timer = null }
    try Files.deleteIfExists(dir) catch { case _: Exception => () }
  }
}
