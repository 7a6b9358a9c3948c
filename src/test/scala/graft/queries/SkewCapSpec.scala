package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-key guards for the bucketed dedup queries.
  *
  * A band bucket (q22) or posting list (q24) of size s produces s² candidate
  * pairs — at 100 TB one stop phrase or boilerplate cluster would put a
  * quadratic blowup behind a single shuffle key. The caps drop those keys
  * from PAIR GENERATION only; this spec feeds a worst-case corpus (every
  * document identical, so every shingle/band key has document frequency = N)
  * and asserts the capped plans produce zero in-bucket pairs — i.e. the d²
  * work never happens — while a small cluster below the cap still pairs
  * normally. */
class SkewCapSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def docsView(n: Int): Unit = {
    import spark.implicits._
    LlmQueries.registerFunctions(spark)
    // worst case: all documents share every shingle (identical boilerplate)
    (0L until n.toLong).map(i => (i, "the quick brown fox jumps over the lazy dog again"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
  }

  test("q24 posting-list cap drops stop-phrase shingles (no d² pair generation)") {
    docsView(300)
    // df cap 10 << 300 identical docs: every shingle is over-frequency
    assert(spark.sql(LlmQueries.ngramJaccardSql(dfCap = 10)).count() == 0)
  }

  test("q24 cap does not suppress small clusters") {
    docsView(5)
    // 5 identical docs, cap 10: all C(5,2)=10 pairs, jaccard 1.0
    val rows = spark.sql(LlmQueries.ngramJaccardSql(dfCap = 10)).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(2) == 1.0))
  }

  test("q22 band-bucket cap drops degenerate near-dup clusters") {
    docsView(300)
    // identical docs -> identical signatures -> one 300-doc band bucket per band
    assert(spark.sql(LlmQueries.minhashSql(bandCap = 10)).count() == 0)
  }

  test("q22 cap does not suppress small clusters") {
    docsView(5)
    val rows = spark.sql(LlmQueries.minhashSql(bandCap = 10)).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(2) == 1.0))
  }

  private def embsView(n: Int): Unit = {
    import spark.implicits._
    LlmQueries.registerFunctions(spark)
    // worst case: every embedding identical -> one centroid cell holds all
    // n vectors and every pair has cosine 1.0
    (0L until n.toLong).map(i => (i, Array(1.0f, 0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
  }

  test("q112 cell cap drops pair generation in a hot cell (no s² work)") {
    embsView(300)
    // one 300-vector cell >> cap 10: the self-join must produce no pairs;
    // the audit still reports the cell honestly with nothing dropped
    val rows = spark.sql(LlmQueries.semdedupSql(cellCap = 10)).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 300L && rows.head.getLong(2) == 0L)
  }

  test("q112 cap does not suppress small cells") {
    embsView(5)
    // 5 identical vectors under cap 10: min-id representative survives,
    // the other 4 drop
    val rows = spark.sql(LlmQueries.semdedupSql(cellCap = 10)).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 5L && rows.head.getLong(2) == 4L)
  }
}
