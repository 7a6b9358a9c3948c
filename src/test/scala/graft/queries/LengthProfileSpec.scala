package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q58's scale story: the exact interpolated percentile stays the
  * oracle-gated query; the approx_percentile sketch variant (bounded
  * per-group memory — the right default for unbounded metrics at 100 TB)
  * must honor the sketch's RANK guarantee against the real data. A
  * value-space comparison would be the wrong check: on long-tailed
  * lengths, adjacent ranks can sit far apart in value, so a correct
  * sketch can legitimately return a value far from the interpolated
  * exact while being within 1e-4 of the target rank. */
class LengthProfileSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.01"

  test("approx variant: counts/min/max exact, percentiles within rank tolerance") {
    val exact = LlmQueries.lengthProfileExact(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = LlmQueries.lengthProfileApprox(spark, dir)
    assert(approx.columns.toSeq == Seq(
      "source", "n_docs", "p50_chars", "p90_chars", "min_chars", "max_chars"))
    val aRows = approx.collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == aRows.keySet, "same source groups")
    for ((src, e) <- exact; a = aRows(src)) {
      assert(a.getLong(1) == e.getLong(1), s"$src n_docs")
      assert(a.getLong(4) == e.getLong(4) && a.getLong(5) == e.getLong(5), s"$src min/max")
    }

    // Rank check: the fraction of group values below/at the sketch's
    // answer must bracket the target quantile. Tie-aware: frac(<) may
    // undershoot and frac(<=) overshoot by the mass of duplicates, so
    // each side is bounded separately. eps = sketch error (1e-4 at
    // accuracy 10000) + finite-group slack (1/n ≈ 2e-3) « 0.03.
    val docs = graft.Tables.documents(spark, dir)
    val ranks = docs.join(approx, "source")
      .groupBy(col("source"))
      .agg(
        (sum(when(col("n_chars") < col("p50_chars"), 1).otherwise(0)) / count(lit(1))).as("lt50"),
        (sum(when(col("n_chars") <= col("p50_chars"), 1).otherwise(0)) / count(lit(1))).as("le50"),
        (sum(when(col("n_chars") < col("p90_chars"), 1).otherwise(0)) / count(lit(1))).as("lt90"),
        (sum(when(col("n_chars") <= col("p90_chars"), 1).otherwise(0)) / count(lit(1))).as("le90"))
      .collect()
    val eps = 0.03
    for (r <- ranks) {
      val src = r.getString(0)
      assert(r.getDouble(1) < 0.5 + eps && r.getDouble(2) > 0.5 - eps,
        s"$src p50 rank out of tolerance: <${r.getDouble(1)} <=${r.getDouble(2)}")
      assert(r.getDouble(3) < 0.9 + eps && r.getDouble(4) > 0.9 - eps,
        s"$src p90 rank out of tolerance: <${r.getDouble(3)} <=${r.getDouble(4)}")
    }
  }
}
