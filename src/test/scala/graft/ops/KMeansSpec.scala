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

  test("early stop is a fixpoint: one more unrolled E/M round reproduces the codebook") {
    // The q65 oracle-parity argument: the engine may stop at round r < N
    // while the oracle unrolls all N rounds — valid only if an E/M round
    // over the converged codebook reproduces the identical 6dp-rounded
    // centroids. Recompute that extra round test-side and compare.
    val vecs = Seq[(Long, Seq[Double])](
      0L -> Seq(0.0), 1L -> Seq(1.0), 2L -> Seq(0.2), 3L -> Seq(0.4),
      4L -> Seq(100.0), 5L -> Seq(100.2), 6L -> Seq(100.4))
    val (atConv, iters) = KMeans.trainCodebook(spark, embDf(vecs), k = 2, maxIter = 10)
    assert(iters < 10)
    val cb = atConv.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    // E-step: nearest centroid, (d2, cluster) tie-break
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val assigned = vecs.map { case (_, e) => (cb.minBy { case (c, cv) => (d2(e, cv), c) }._1, e) }
    // M-step: 6dp-rounded per-cluster means
    val recomputed = assigned.groupBy(_._1).map { case (c, grp) =>
      val dim = grp.head._2.length
      c -> (0 until dim).map(p =>
        BigDecimal(grp.map(_._2(p)).sum / grp.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    assert(cb.map { case (c, v) => (c, v.toList) }.toList ==
      recomputed.map { case (c, v) => (c, v.toList) }.toList)
  }

  test("q65 parity: engine train(maxIter=4) equals a 4-round no-early-stop unroll") {
    // The exact invariant the q65 DuckDB oracle relies on: whatever round
    // the engine stops at, its codebook equals 4 unconditionally-unrolled
    // E/M rounds (early stop ⇒ fixpoint rounds; no early stop ⇒ both ran
    // exactly 4). Recompute the unroll driver-side on the real fixture.
    import org.apache.spark.sql.functions.{col, expr}
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS double))").as("e"))
    val (cbDf, iters) = KMeans.trainCodebook(spark, emb, k = 8, maxIter = 4)
    assert(iters <= 4)
    val engine = cbDf.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val pts = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cents: Map[Long, Array[Double]] = pts.filter(_._1 < 8).toMap
    for (_ <- 1 to 4) {
      val assigned = pts.map { case (_, e) =>
        (cents.toSeq.map { case (c, cv) => (d2(e, cv), c) }.min._2, e)
      }
      cents = assigned.groupBy(_._1).map { case (c, g) =>
        c -> Array.tabulate(g.head._2.length)(p =>
          BigDecimal(g.map(_._2(p)).sum / g.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(engine.keySet == cents.keySet)
    // 2e-6: distributed vs sequential double-sum order can flip the 6th
    // decimal's rounding; the DuckDB hash gate pins the SQL-level equality
    for (c <- engine.keySet.toSeq.sorted; p <- engine(c).indices)
      assert(math.abs(engine(c)(p) - cents(c)(p)) <= 2e-6,
        s"cluster $c pos $p: engine ${engine(c)(p)} vs unroll ${cents(c)(p)}")
  }

  test("maxIter caps the loop even when not converged") {
    val vecs = Seq[(Long, Seq[Double])](
      0L -> Seq(0.0), 1L -> Seq(1.0), 2L -> Seq(0.2), 3L -> Seq(0.4),
      4L -> Seq(100.0), 5L -> Seq(100.2), 6L -> Seq(100.4))
    val (_, iters) = KMeans.train(spark, embDf(vecs), k = 2, maxIter = 1)
    assert(iters == 1)
  }
}
