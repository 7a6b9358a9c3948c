package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All engine queries take an `sfDir` (scale-factor directory) and read
  * parquet from it; at cluster scale the same code path reads a
  * partitioned table root, so nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    // reader rejects outright; read it as a nanos long instead and convert
    // below (TESTDATA tables are driver-generated, not ours to rewrite).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** `ts` arrives as a nanosecond epoch long (see apply); surface it as a
    * proper TimestampType column. Integer `div` (not `/`, which is double
    * division and loses precision above 2^53) keeps exact microseconds.
    * Installs [[graft.plans.NanosTimePushdown]] so time predicates on the
    * derived column still prune parquet row groups via the raw long.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val rule = graft.plans.NanosTimePushdown
    if (!spark.experimental.extraOptimizations.exists(_ eq rule))
      spark.experimental.extraOptimizations ++= Seq(rule)
    apply(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
