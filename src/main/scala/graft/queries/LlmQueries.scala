package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Large-scale training-data pipeline operators over `documents` /
  * `embeddings`: dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard),
  * similarity search (brute-force + LSH-bucketed cosine), text analysis
  * (tokens, quality, lang-ID, fingerprints). Populated incrementally.
  */
object LlmQueries extends QueryModule {
  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override val oracles: Map[String, String] = Map()
}
