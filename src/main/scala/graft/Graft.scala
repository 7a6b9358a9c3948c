package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call session setup — the library's front door.
  *
  * `Graft.init(spark, dataDir)` registers every engine table as a temp
  * view (with the events nanos→timestamp normalization) and the native
  * text/vector SQL functions, after which the full surface is reachable
  * three ways:
  *
  *  - plain Spark SQL: `spark.sql("SELECT simhash32(text) FROM documents")`
  *  - KQL text: `Graft.kql(spark, "events | where value > 50 | count")`
  *  - the prebuilt operators: `SparkEntry.queries("q22_minhash_lsh")(spark, dir)`
  */
object Graft {

  /** Register all tables under `dataDir` as temp views plus the native
    * functions (word_shingles, word_shingle_hashes, minhash_sig,
    * simhash32, winnow_fps, dot_d). Idempotent.
    *
    * NOTE: this opts THIS session into the engine's optimizer default
    * (`InferFiltersFromGenerate` excluded — right for computed-array
    * explodes, see [[graft.queries.LlmQueries.registerFunctions]]).
    * The prebuilt `SparkEntry.queries` never need init and keep that
    * exclusion scoped to their own child sessions; for function
    * registration WITHOUT the optimizer opt-in, use
    * `spark.sql.extensions=graft.GraftExtensions` or
    * [[graft.functions.GraftFunctions.register]]. */
  def init(spark: SparkSession, dataDir: String): SparkSession = {
    graft.queries.LlmQueries.registerFunctions(spark)
    // normalized views (events gets its timestamp column converted)
    Seq(
      "region" -> Tables.region(spark, dataDir),
      "nation" -> Tables.nation(spark, dataDir),
      "customer" -> Tables.customer(spark, dataDir),
      "supplier" -> Tables.supplier(spark, dataDir),
      "part" -> Tables.part(spark, dataDir),
      "orders" -> Tables.orders(spark, dataDir),
      "lineitem" -> Tables.lineitem(spark, dataDir),
      "events" -> Tables.events(spark, dataDir),
      "documents" -> Tables.documents(spark, dataDir),
      "embeddings" -> Tables.embeddings(spark, dataDir)
    ).foreach { case (n, df) => df.createOrReplaceTempView(n) }
    spark
  }

  /** Run KQL text against the views registered by [[init]]. */
  def kql(spark: SparkSession, query: String): DataFrame =
    graft.kql.KqlCompiler.compile(spark, query)
}
