package graft.sources

import graft.config.SinkConfigException
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — the Kafka source scan, Spark-first: the engine consumes via
  * `spark.readStream.format("kafka")`, whose row schema (key/value
  * binary, topic, partition, offset, timestamp, headers) is exactly the
  * record model the pipeline's SinkRecord expects. This builder maps the
  * connector-style subscription surface onto the Spark source options:
  *
  *  - explicit topic list  → `subscribe`
  *  - `topics.regex`       → `subscribePattern`
  *    (reference: KustoSinkIT.java:229-231 exercises topics.regex)
  *  - `maxOffsetsPerTrigger` approximates the size axis of the
  *    size-OR-time roll (B1) at the source; the byte-exact check happens
  *    in RollingFileWriter inside the batch (SURVEY §4).
  *  - `minPartitions` is the task fan-out lever (reference `tasks.max`,
  *    P1) — Spark splits Kafka partitions into more tasks when asked.
  *
  * The kafka connector jar is not present in this offline environment,
  * so `load()` is exercised by tests only up to option construction;
  * MemoryStream-based tests cover the downstream pipeline.
  */
final case class KafkaSourceConfig(
    bootstrapServers: String,
    topics: Seq[String] = Nil,
    topicsRegex: Option[String] = None,
    startingOffsets: String = "earliest",
    maxOffsetsPerTrigger: Option[Long] = None,
    minPartitions: Option[Int] = None,
    failOnDataLoss: Boolean = true,
    includeHeaders: Boolean = false) {

  if (bootstrapServers == null || bootstrapServers.trim.isEmpty)
    throw new SinkConfigException("kafka bootstrap servers are required")
  if (topics.isEmpty && topicsRegex.isEmpty)
    throw new SinkConfigException("either a topic list or topics.regex is required")
  if (topics.nonEmpty && topicsRegex.nonEmpty)
    throw new SinkConfigException("topic list and topics.regex are mutually exclusive")
  if (startingOffsets != "earliest" && startingOffsets != "latest" &&
      !startingOffsets.trim.startsWith("{"))
    throw new SinkConfigException(
      s"startingOffsets must be earliest|latest|per-partition JSON, got '$startingOffsets'")
  maxOffsetsPerTrigger.foreach(v =>
    if (v <= 0) throw new SinkConfigException("maxOffsetsPerTrigger must be positive"))

  def options: Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      (if (topics.nonEmpty) Map("subscribe" -> topics.mkString(","))
       else Map("subscribePattern" -> topicsRegex.get))
    base ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      minPartitions.map("minPartitions" -> _.toString) ++
      (if (includeHeaders) Map("includeHeaders" -> "true") else Map.empty)
  }

  def load(spark: SparkSession): DataFrame =
    options.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
}
