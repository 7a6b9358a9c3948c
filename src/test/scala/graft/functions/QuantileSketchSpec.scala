package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The pinned mergeable-percentile sketch: order-insensitivity (the
  * property Kusto's real t-digest LACKS and this engine pins for),
  * exact two-level merge, relative-error accuracy bound, and the
  * sign/zero/empty edges. Driven through the KQL text compiler. */
class QuantileSketchSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private lazy val df = {
    import spark.implicits._
    // deterministic pseudo-random-ish values incl. negatives and zeros
    (1 to 5000).map { i =>
      val v = if (i % 97 == 0) 0.0 else math.sin(i.toDouble) * 1000.0
      (i.toLong, (i % 7).toString, v)
    }.toDF("id", "k", "v")
  }
  private def run(kql: String, d: org.apache.spark.sql.DataFrame) =
    graft.kql.KqlCompiler.compile(kql, _ => d)

  test("sketch value is identical across partitionings (order-insensitive)") {
    val a = run("t | summarize s = tdigest(v)", df.repartition(1)).collect().head.getString(0)
    val b = run("t | summarize s = tdigest(v)", df.repartition(13)).collect().head.getString(0)
    assert(a == b && a.startsWith("""{"a":0.01,"z":"""))
  }

  test("two-level rollup: tdigest_merge of per-key sketches == direct sketch, exactly") {
    val direct = run("t | summarize s = tdigest(v)", df).collect().head.getString(0)
    val twoLevel = run(
      """t | summarize s = tdigest(v) by k
        | | summarize s = tdigest_merge(s)""".stripMargin, df).collect().head.getString(0)
    assert(direct == twoLevel)
  }

  test("percentile_tdigest within the 1% relative-error bound; empty → null") {
    val exactP = df.stat.approxQuantile("v", Array(0.1, 0.5, 0.9), 0.0)
    val r = run(
      """t | summarize s = tdigest(v)
        | | project p10 = percentile_tdigest(s, 10), p50 = percentile_tdigest(s, 50),
        |           p90 = percentile_tdigest(s, 90)""".stripMargin, df).collect().head
    Seq(0, 1, 2).foreach { i =>
      val est = r.getDouble(i); val ex = exactP(i)
      assert(math.abs(est - ex) <= 0.0101 * math.abs(ex) + 1e-9,
        s"p at idx $i: est $est vs exact $ex")
    }
    val e = run("t | where v > 99999999.0 | summarize s = tdigest(v) | project p = percentile_tdigest(s, 50)", df)
      .collect().head
    assert(e.isNullAt(0))
  }

  test("percentrank_tdigest: inverse of percentile within one bucket, accurate vs exact rank") {
    // exact percent rank (strictly-below + half-ties) for probes
    import spark.implicits._
    val vals = df.select("v").as[Double].collect()
    val n = vals.length.toDouble
    def exactRank(x: Double): Double =
      100.0 * (vals.count(_ < x) + 0.5 * vals.count(_ == x)) / n
    val r = run(
      """t | summarize s = tdigest(v)
        | | project r1 = percentrank_tdigest(s, -500.0), r2 = percentrank_tdigest(s, 0.0),
        |           r3 = percentrank_tdigest(s, 500.0),
        |           v1 = percentile_tdigest(s, percentrank_tdigest(s, -500.0)),
        |           v3 = percentile_tdigest(s, percentrank_tdigest(s, 500.0))""".stripMargin,
      df).collect().head
    // rank accuracy: the probe's bucket spreads at most the bucket mass
    // around the exact rank — generous 2.5-point bound on this data
    assert(math.abs(r.getDouble(0) - exactRank(-500.0)) <= 2.5)
    assert(math.abs(r.getDouble(1) - exactRank(0.0)) <= 2.5)
    assert(math.abs(r.getDouble(2) - exactRank(500.0)) <= 2.5)
    // ranks are ordered and inside [0, 100]
    assert(r.getDouble(0) < r.getDouble(1) && r.getDouble(1) < r.getDouble(2))
    assert(r.getDouble(0) >= 0.0 && r.getDouble(2) <= 100.0)
    // round trip lands back within the bucket's relative error
    assert(math.abs(r.getDouble(3) - (-500.0)) <= 0.03 * 500.0)
    assert(math.abs(r.getDouble(4) - 500.0) <= 0.03 * 500.0)
    // empty sketch → null
    val e = run(
      "t | where v > 99999999.0 | summarize s = tdigest(v) | project r = percentrank_tdigest(s, 1.0)",
      df).collect().head
    assert(e.isNullAt(0))
  }

  test("sign and zero handling: p0 hits the most negative bucket, zeros return 0.0") {
    import spark.implicits._
    val d = Seq(-100.0, -1.0, 0.0, 0.0, 5.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val r = run(
      """t | summarize s = tdigest(v)
        | | project lo = percentile_tdigest(s, 0), mid = percentile_tdigest(s, 50),
        |           hi = percentile_tdigest(s, 100)""".stripMargin, d).collect().head
    assert(math.abs(r.getDouble(0) + 100.0) <= 1.01)  // ~-100 within 1%
    assert(r.getDouble(1) == 0.0)                     // rank 3 of 5 → zero bucket
    assert(math.abs(r.getDouble(2) - 5.0) <= 0.06)
  }
}
