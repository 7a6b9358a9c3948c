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

  /** Parquet footer schemas keyed by path + (mtime, size), so repeated
    * reads of the same table skip the per-read schema-INFERENCE job
    * (`spark.read.parquet` with no declared schema samples footers in a
    * driver job — 30–100 ms per call here, and a many-file listing+read
    * at a 100 TB table root). This is the in-repo equivalent of a
    * metastore-declared schema: METADATA only — no rows, no statistics,
    * no results are retained, and a changed file (mtime/size) misses the
    * cache and re-infers. `-Dgraft.schema.cache=off` restores per-read
    * inference (the A/B hook). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Older testdata vintages stored parquet TIMESTAMP(NANOS), which
    // Spark's reader rejects outright; keep reading those as a nanos long
    // (TESTDATA tables are driver-generated, not ours to rewrite).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Engine execution policy (round 21, guide §2.2): coalesce
    // post-shuffle partitions to the advisory SIZE rather than keeping
    // ~defaultParallelism tiny tasks. Spark's `parallelismFirst=true`
    // default ignores advisoryPartitionSizeInBytes and floors partitions
    // at minPartitionSize (1 MB) to maximize parallelism — the setting
    // the docs themselves recommend turning off for resource efficiency.
    // Measured here: a 32-core run spent more wall scheduling 32 micro-
    // tasks per exchange than an 8-core run spent computing (full-suite
    // 153 s at 32c vs 123 s at 8c, median per-query 8c/32c ratio 0.80);
    // with size-first coalescing, per-query interleaved A/Bs improve up
    // to 1.44× (q226 1.41→0.98 s) across the KQL/relational families.
    // At data scale this is the guide's recommended posture outright
    // (fewer, larger reduce partitions). Sessions whose stages are
    // byte-small but CPU-superlinear (the LLM dedup/kernel module) opt
    // OUT via the marker conf set in LlmShared.registerFunctions —
    // bytes do not predict CPU for posting-list pair explodes, and
    // size-first coalescing serialized their hottest loops (measured
    // q24 2.15→3.23 s). `-Dgraft.aqe.parallelismFirst=default` leaves
    // Spark's default everywhere (the A/B hook).
    if (!sys.props.get("graft.aqe.parallelismFirst").contains("default") &&
        !spark.conf.getOption("spark.graft.aqe.keepParallelismFirst").contains("true"))
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    // Self-install the trailing-sort projection deferral (see the rule's
    // doc) for sessions built without GraftExtensions — every engine
    // query reads through here, the NanosTimePushdown pattern. The
    // check-then-append is synchronized on the session (ADVICE r20): two
    // threads reading tables concurrently on a fresh session could both
    // pass the exists() check and register the rule twice.
    val deferRule = graft.plans.DeferProjectPastSort
    spark.synchronized {
      if (!spark.experimental.extraOptimizations.exists(_ eq deferRule))
        spark.experimental.extraOptimizations ++= Seq(deferRule)
    }
    val path = s"$sfDir/$name.parquet"
    val cacheKey: Option[String] =
      if (sys.props.get("graft.schema.cache").contains("off")) None
      else try {
        val a = java.nio.file.Files.readAttributes(
          java.nio.file.Paths.get(path),
          classOf[java.nio.file.attribute.BasicFileAttributes])
        Some(s"$path@${a.lastModifiedTime.toMillis}:${a.size}")
      } catch { case _: Throwable => None }
    val df = cacheKey match {
      case Some(key) =>
        val schema = schemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
        spark.read.schema(schema).parquet(path)
      case None => spark.read.parquet(path)
    }
    // Current testdata stores timestamps as TIMESTAMP(MICROS) without a
    // timezone flag, which Spark surfaces as TIMESTAMP_NTZ. The engine's
    // time surface (unix_millis, window(), as-of joins, KQL datetime ring)
    // is built on TimestampType; with the session pinned to UTC the cast is
    // an identity on the underlying micros, so normalize here once.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else ntz.foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** Surface `ts` as a proper TimestampType column regardless of how the
    * generator wrote it. Older testdata stored parquet TIMESTAMP(NANOS)
    * (read back as a nanos long via `nanosAsLong`); current testdata stores
    * TIMESTAMP(MICROS), which Spark reads natively. Branch on the actual
    * type so either vintage works. For the long form, integer `div` (not
    * `/`, which is double division and loses precision above 2^53) keeps
    * exact microseconds, and [[graft.plans.NanosTimePushdown]] keeps time
    * predicates pruning parquet row groups via the raw long.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = apply(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val rule = graft.plans.NanosTimePushdown
        spark.synchronized {
          if (!spark.experimental.extraOptimizations.exists(_ eq rule))
            spark.experimental.extraOptimizations ++= Seq(rule)
        }
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
