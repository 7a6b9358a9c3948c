package graft.pipeline

import graft.config.{SinkConfig, TableMapping}
import graft.ingest.LocalTableIngestClient
import java.lang.management.ManagementFactory
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** M1 external surface: the six counters must be readable over JMX (the
  * reference registers `…sink:type=KustoSinkMetrics`,
  * KustoSinkMetrics.java:17-122) and snapshotted per micro-batch through
  * the streaming listener bus. */
class SinkMetricsPublisherSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private case class KRecord(topic: String, partition: Int, offset: Long,
                             key: Array[Byte], value: Array[Byte])

  test("JMX MBean exposes live counters; listener snapshots each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tablesRoot = Files.createTempDirectory("jmx-tables").toString
    val metrics = SinkMetrics.forSpark(spark)
    val publisher = new SinkMetricsPublisher(metrics, name = "spec").register(spark)
    try {
      val cfg = SinkConfig(
        mappings = Seq(TableMapping("topicA", "db1", "tableA")),
        flushSizeBytes = 150, flushIntervalMs = 0, maxRetryTimeMs = 20, retryBackoffMs = 10,
        tempDir = Files.createTempDirectory("jmx-stage").toString)
      val pipeline = new KustoSparkPipeline(
        cfg, () => new LocalTableIngestClient(tablesRoot), None, metrics)

      val stream = MemoryStream[KRecord]
      stream.addData((0 until 7).map(i =>
        KRecord("topicA", 0, i, null, s"""{"n":$i}""".getBytes(UTF_8))))
      val q = pipeline.start(stream.toDF(), Files.createTempDirectory("jmx-ckpt").toString)
      q.processAllAvailable()
      // listener events are delivered asynchronously after the batch commits
      val deadline = System.nanoTime() + 10_000_000_000L
      while (publisher.lastBatchId < 0 && System.nanoTime() < deadline) Thread.sleep(20)
      q.stop()

      // JMX read-back of the live counters
      val server = ManagementFactory.getPlatformMBeanServer
      assert(server.isRegistered(publisher.objectName))
      def attr(n: String): Long =
        server.getAttribute(publisher.objectName, n).asInstanceOf[Long]
      assert(attr("RecordsWritten") == 7)
      assert(attr("IngestionSuccesses") == attr("IngestionAttempts"))
      assert(attr("IngestionSuccesses") > 0)
      assert(attr("RecordsFailed") == 0 && attr("DlqRecordsSent") == 0)

      // per-batch snapshot from the listener bus
      assert(publisher.lastBatchId >= 0, "progress event captured")
      assert(publisher.lastSnapshot("records-written") == 7)
    } finally {
      publisher.close()
      spark.streams.removeListener(publisher)
    }
    assert(!ManagementFactory.getPlatformMBeanServer.isRegistered(publisher.objectName),
      "close() unregisters the MBean")
  }
}
