package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's-loop training: convergence (early stop via the assignment
  * checksum), centroid correctness on separable data, and the case where
  * the loop genuinely has to iterate (initial centroids both inside one
  * true cluster). */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def embDf(vecs: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    vecs.toDF("vec_id", "e")
  }

  test("separable clusters: converges with early stop, centroids = exact means") {
    // 3 well-separated clusters at 0 / 100 / 200 (dim 2), interleaved ids
    // so the vec_id < 3 init picks one seed per true cluster.
    val vecs = (0L until 30L).map { i =>
      val c = (i % 3).toDouble
      (i, Seq(c * 100.0 + (i / 3).toDouble * 0.1, c * 100.0 - (i / 3).toDouble * 0.1))
    }
    val (cents, iters) = KMeans.train(spark, embDf(vecs), k = 3, maxIter = 10)
    assert(iters < 10, "must early-stop via the assignment checksum, not exhaust maxIter")
    assert(iters <= 3, s"separable data should fix almost immediately, took $iters M-steps")
    val rows = cents.collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(rows.size == 6) // 3 clusters × dim 2
    // exact per-cluster means: offsets 0.0, 0.1, …, 0.9 average to 0.45
    for (c <- 0 to 2) {
      assert(math.abs(rows((c.toLong, 0)) - (c * 100.0 + 0.45)) < 1e-6)
      assert(math.abs(rows((c.toLong, 1)) - (c * 100.0 - 0.45)) < 1e-6)
    }
  }

  test("bad init inside one cluster: the loop actually iterates, then converges") {
    // Both seeds (vec_id 0, 1) sit in the low cluster; vector 1.0 first
    // assigns to seed c1, and only after the M-step pulls c1 to ~80 does
    // it re-assign to c0 — requiring a real second E/M round.
    val vecs = Seq[(Long, Seq[Double])](
      0L -> Seq(0.0), 1L -> Seq(1.0), 2L -> Seq(0.2), 3L -> Seq(0.4),
      4L -> Seq(100.0), 5L -> Seq(100.2), 6L -> Seq(100.4))
    val (cents, iters) = KMeans.train(spark, embDf(vecs), k = 2, maxIter = 10)
    assert(iters == 2, s"expected exactly 2 M-steps (re-assignment after round 1), got $iters")
    val rows = cents.collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(math.abs(rows((0L, 0)) - 0.4) < 1e-6)   // mean(0, 1, 0.2, 0.4)
    assert(math.abs(rows((1L, 0)) - 100.2) < 1e-6) // mean(100, 100.2, 100.4)
  }

  test("maxIter caps the loop even when not converged") {
    val vecs = Seq[(Long, Seq[Double])](
      0L -> Seq(0.0), 1L -> Seq(1.0), 2L -> Seq(0.2), 3L -> Seq(0.4),
      4L -> Seq(100.0), 5L -> Seq(100.2), 6L -> Seq(100.4))
    val (_, iters) = KMeans.train(spark, embDf(vecs), k = 2, maxIter = 1)
    assert(iters == 1)
  }
}
