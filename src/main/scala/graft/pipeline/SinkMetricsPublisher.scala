package graft.pipeline

import java.lang.management.ManagementFactory
import javax.management.ObjectName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** MXBean view of the six sink counters — same attribute surface as the
  * reference's JMX bean (reference: KustoSinkMetricsMXBean.java:6-19,
  * KustoSinkMetrics.java:17-122). */
trait SinkMetricsMXBean {
  def getRecordsWritten: Long
  def getRecordsFailed: Long
  def getIngestionAttempts: Long
  def getIngestionSuccesses: Long
  def getIngestionFailures: Long
  def getDlqRecordsSent: Long
}

/** External metrics surface for a running pipeline: registers the live
  * counters as a JMX MBean (`graft.sink:type=KustoSinkMetrics,name=…`)
  * and, as a `StreamingQueryListener`, captures a per-micro-batch
  * snapshot on every progress event so dashboards/ops hooks can read a
  * consistent point-in-time view without touching accumulators.
  *
  * The counters themselves are Spark accumulators (driver-aggregated in
  * cluster mode), so the MBean reads are correct on the driver regardless
  * of executor count — the scale story is Spark's, not this class's.
  */
final class SinkMetricsPublisher(metrics: SinkMetrics, name: String = "default")
    extends StreamingQueryListener with SinkMetricsMXBean with AutoCloseable {

  def getRecordsWritten: Long = metrics.recordsWritten.value
  def getRecordsFailed: Long = metrics.recordsFailed.value
  def getIngestionAttempts: Long = metrics.ingestionAttempts.value
  def getIngestionSuccesses: Long = metrics.ingestionSuccesses.value
  def getIngestionFailures: Long = metrics.ingestionFailures.value
  def getDlqRecordsSent: Long = metrics.dlqRecordsSent.value

  val objectName: ObjectName =
    new ObjectName(s"graft.sink:type=KustoSinkMetrics,name=$name")

  /** Snapshot taken at the last micro-batch progress event (with the
    * batch id it was taken at); empty until the first batch completes. */
  @volatile var lastSnapshot: Map[String, Long] = Map.empty
  @volatile var lastBatchId: Long = -1L

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    lastSnapshot = metrics.snapshot
    lastBatchId = event.progress.batchId
  }
  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Registers the MBean with the platform server and the listener with
    * the session's streams bus. Idempotent MBean registration (replace). */
  def register(spark: SparkSession): SinkMetricsPublisher = {
    val server = ManagementFactory.getPlatformMBeanServer
    if (server.isRegistered(objectName)) server.unregisterMBean(objectName)
    // explicit StandardMBean wrapper: the class also extends
    // StreamingQueryListener, so don't rely on implicit MXBean inference
    server.registerMBean(
      new javax.management.StandardMBean(this, classOf[SinkMetricsMXBean], true), objectName)
    spark.streams.addListener(this)
    this
  }

  /** Unregisters the MBean; detach from `spark.streams` separately if the
    * session outlives the pipeline. */
  override def close(): Unit = {
    val server = ManagementFactory.getPlatformMBeanServer
    if (server.isRegistered(objectName)) server.unregisterMBean(objectName)
  }
}
