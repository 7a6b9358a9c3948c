package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-expressed semantics of the reference's §2.1 dataflow operators
  * (tombstone filter, empty filter, router, encoders, size-roll, offset
  * gate, DLQ) so each gets a DuckDB-checked correctness entry in addition
  * to its Scala implementation + ScalaTest. Populated incrementally.
  */
object PipelineQueries extends QueryModule {
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override val oracles: Map[String, String] = Map()
}
