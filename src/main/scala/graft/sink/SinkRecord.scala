package graft.sink

/** The engine's record unit inside the sink stage — the Spark Kafka
  * source's row shape (key/value binary + coordinates), carried as a case
  * class once rows leave Catalyst and enter per-partition file IO.
  *
  * Upstream of the sink stage everything is a DataFrame: struct→JSON/CSV
  * encoding happens declaratively with `to_json`/`to_csv` (codegen'd), so
  * by the time a record reaches a staging file its `value` is the final
  * wire bytes. A `null` value is a tombstone
  * (reference: KustoSinkTask.java:510-513 drops them before writing).
  */
final case class SinkRecord(
    topic: String,
    partition: Int,
    offset: Long,
    key: Array[Byte],
    value: Array[Byte]) {
  def isTombstone: Boolean = value == null
  def valueString: String = if (value == null) "" else new String(value, java.nio.charset.StandardCharsets.UTF_8)
}
