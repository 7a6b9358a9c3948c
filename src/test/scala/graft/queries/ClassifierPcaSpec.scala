package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q144/q145 semantics pins beyond the DuckDB oracle (which unrolls the
  * exact GD / power-iteration rounds): determinism across runs (no
  * rand()/seed state anywhere in either loop) and the linear-algebra
  * invariants the oracle can't express directly. */
class ClassifierPcaSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("q144: trained weights are deterministic, discriminative, 65 rows") {
    val run1 = LlmQueries.queries("q144_quality_classifier")(spark, dir).collect()
    assert(run1.length == 65) // 64 buckets + intercept (-1)
    assert(run1.map(_.getLong(0)).toSeq == (-1L to 63L))
    // the intercept must move from 0 TOWARD the base-rate logit:
    // sign(b0) == sign(ln(frac_en / (1 − frac_en)))
    val docs = graft.Tables.documents(spark, dir)
    val fracEn = docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count().toDouble /
      docs.count().toDouble
    val b0 = run1.find(_.getLong(0) == -1L).get.getDouble(1)
    assert(b0 * math.log(fracEn / (1 - fracEn)) > 0,
      s"intercept should move toward the base-rate logit (frac_en=$fracEn), got $b0")
    // at least some buckets develop nonzero weights
    assert(run1.count(r => math.abs(r.getDouble(1)) > 1e-6) > 10)
    // bit-identical re-run (content-derived hashes, fixed fold orders)
    val run2 = LlmQueries.queries("q144_quality_classifier")(spark, dir).collect()
    assert(run1.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      run2.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("q145: unit-norm loading, positive eigenvalue, deterministic") {
    val rows = LlmQueries.queries("q145_pca_power")(spark, dir).collect()
    assert(rows.length == 65) // 64 dims + eigenvalue (-1)
    val loadings = rows.filter(_.getLong(0) >= 0).map(_.getDouble(1))
    assert(loadings.length == 64)
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"power-iteration output must be unit norm, got $norm")
    val lambda = rows.find(_.getLong(0) == -1L).get.getDouble(1)
    assert(lambda > 0, s"top eigenvalue of a covariance matrix is positive, got $lambda")
    val again = LlmQueries.queries("q145_pca_power")(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
