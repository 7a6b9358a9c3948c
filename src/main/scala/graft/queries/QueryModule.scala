package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of engine queries plus their DuckDB oracle SQL.
  *
  * Contract (driver-side, see Verify.scala): for every key in `queries`
  * the driver runs the Spark plan at sf0.01 and, when a matching key
  * exists in `oracles`, runs the SQL in DuckDB over the same parquet
  * tables (registered as views named `lineitem`, `orders`, …) and
  * compares row/schema/hash. Column names MUST match between the two;
  * every query here also imposes a deterministic ORDER BY on both sides
  * so the comparison never depends on engine row order.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
