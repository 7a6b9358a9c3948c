package graft.pipeline

import graft.config.{ErrorBehavior, SinkConfig, SinkConfigException}
import graft.ingest._
import graft.sink._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import scala.collection.mutable

/** The engine's streaming ETL pipeline — the Spark-native restatement of
  * the reference connector's hot path (SURVEY §3.1):
  *
  * {{{
  * source (kafka-schema DataFrame: key, value, topic, partition, offset)
  *   └─ tombstone filter (Catalyst, F1)
  *       └─ foreachBatch
  *           └─ foreachPartition            — no shuffle: Kafka partitions
  *               ├─ route topic → mapping   —   arrive pre-partitioned (R1)
  *               ├─ RollingFileWriter       — size-OR-time gzip roll (B1-B4)
  *               └─ IngestPipe.handleRoll   — retry/DLQ/status (K1-K5)
  *       └─ checkpoint commit               — offsets advance ONLY if the
  *                                            batch succeeded (K6)
  * }}}
  *
  * At-least-once: Structured Streaming writes the offset WAL before a
  * batch and the commit log only after `foreachBatch` returns, so a
  * failed/aborted ingest (FAIL mode) halts the query with offsets parked
  * at the last fully-ingested batch — the exact semantics of the
  * reference's `preCommit` gate (reference: KustoSinkTask.java:522-546).
  *
  * Scale: the only wide operation here is NONE — routing, encoding,
  * rolling, and ingestion are all narrow per-partition work, so the
  * pipeline scales linearly with source partitions on a 1000-executor
  * cluster exactly as it does on local[32].
  */
final class KustoSparkPipeline(
    config: SinkConfig,
    clientFactory: () => IngestClient,
    dlqFactory: Option[() => DlqProducer],
    metrics: SinkMetrics,
    retrySleeper: Long => Unit = RetryPolicy.defaultSleeper) extends Serializable {

  /** The foreachBatch body; also directly callable on a batch DataFrame
    * for batch-mode backfills over the same code path. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val cols = batch.columns.toSet
    require(Set("topic", "partition", "offset", "value").subsetOf(cols),
      s"sink input needs kafka-source schema (topic, partition, offset, value); got $cols")
    val withKey = if (cols.contains("key")) batch else batch.withColumn("key", lit(null).cast("binary"))
    // headers ride along when the source provides them (kafka source with
    // includeHeaders=true, or any column castable to the same shape)
    val headersType = "array<struct<key:string,value:binary>>"
    val withHeaders =
      if (cols.contains("headers")) withKey
      else withKey.withColumn("headers", lit(null).cast(headersType))

    // F1 tombstone filter — declarative, pushed into the scan by Catalyst.
    val live = withHeaders
      .select(col("topic").cast("string"), col("partition").cast("int"),
        col("offset").cast("long"), col("key").cast("binary"), col("value").cast("binary"),
        col("headers").cast(headersType))
      .filter(col("value").isNotNull)

    val conf = config
    val mkClient = clientFactory
    val mkDlq = dlqFactory
    val m = metrics
    val sleeper = retrySleeper

    live.foreachPartition { rows: Iterator[Row] =>
      val client = mkClient()
      val dlq = mkDlq.map(_())
      val retry = RetryPolicy(conf.maxRetryTimeMs, conf.retryBackoffMs, sleeper)
      val writers = mutable.Map.empty[(String, Int), (RollingFileWriter, IngestPipe)]
      try {
        rows.foreach { row =>
          val hs = row.getAs[scala.collection.Seq[Row]](5) match {
            case null => Nil
            case rs => rs.iterator.map(h => RecordHeader(h.getString(0), h.getAs[Array[Byte]](1))).toSeq
          }
          val rec = SinkRecord(row.getString(0), row.getInt(1), row.getLong(2),
            row.getAs[Array[Byte]](3), row.getAs[Array[Byte]](4), hs)
          conf.router.lookup(rec.topic) match {
            case None =>
              // R1 error path (reference: KustoSinkTask.java:504-509)
              if (conf.behaviorOnError == ErrorBehavior.Fail)
                throw new SinkConfigException(
                  s"no table mapping for topic '${rec.topic}' and no '*' wildcard")
              m.recordsFailed.inc()
              dlq.foreach { d =>
                m.dlqRecordsSent.inc()
                d.send((s"No mapping for topic=${rec.topic}, partition=${rec.partition}, " +
                  s"offset=${rec.offset}.${rec.headersDescription}").getBytes("UTF-8"), rec.value)
              }
            case Some(mapping) =>
              val (writer, _) = writers.getOrElseUpdate((rec.topic, rec.partition), {
                val target = IngestTarget(mapping.db, mapping.table, mapping.format,
                  mapping.mapping, mapping.streaming)
                val pipe = new IngestPipe(client, target, retry, conf.behaviorOnError, dlq, m)
                // avro WITHOUT a schema = avro-as-bytes: each value is a
                // complete container file, so the writer must roll per
                // record (concatenated containers in one gzip are
                // unreadable; reference FileWriter.java:298-301,321-323)
                val isAvro = mapping.format == "avro" || mapping.format == "apacheavro"
                val w = new RollingFileWriter(
                  conf.tempDir, rec.topic, rec.partition,
                  FormatWriters.forFormat(mapping.format, mapping.valueSchema),
                  conf.flushSizeBytes, conf.flushIntervalMs,
                  pipe.handleRoll, retainRecords = conf.dlqEnabled && dlq.isDefined,
                  rollEveryRecord = isAvro && mapping.valueSchema.isEmpty)
                (w, pipe)
              })
              try {
                writer.write(rec)
                m.recordsWritten.inc()
              } catch {
                case e: IngestExhaustedException => throw e // ingest failures escalate regardless
                case e: Exception =>
                  // per-record write failure — error-mode switch (K4)
                  conf.behaviorOnError match {
                    case ErrorBehavior.Fail => throw e
                    case mode =>
                      if (mode == ErrorBehavior.Log)
                        KustoSparkPipeline.log.warn("record write failed at {}/{}/{}: {}",
                          rec.topic, rec.partition, rec.offset, e.getMessage)
                      m.recordsFailed.inc()
                      dlq.foreach { d =>
                        m.dlqRecordsSent.inc()
                        d.send((s"Failed to sink record topic=${rec.topic}, partition=${rec.partition}, " +
                          s"offset=${rec.offset}.${rec.headersDescription}").getBytes("UTF-8"), rec.value)
                      }
                  }
              }
          }
        }
        // End of partition: flush residual files through ingest. A failure
        // here propagates and fails the batch — offsets must not advance
        // past data that never reached the sink.
        writers.values.foreach { case (w, _) => w.close() }
      } catch {
        case e: Throwable =>
          writers.values.foreach { case (w, _) => try w.abort() catch { case _: Exception => () } }
          throw e
      } finally {
        try client.close() catch { case _: Exception => () }
      }
    }
  }

  /** Start the streaming query: source must have the kafka-source schema. */
  def start(source: DataFrame, checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    source.writeStream
      .queryName("kusto-sink")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
}

object KustoSparkPipeline {
  // shared per-JVM logger for executor-side batch processing (slf4j
  // loggers are not serializable — the object re-resolves per executor)
  private[pipeline] lazy val log =
    org.slf4j.LoggerFactory.getLogger(classOf[KustoSparkPipeline])
}
