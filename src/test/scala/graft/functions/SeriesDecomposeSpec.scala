package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the series_decompose family — hand-computed seasonal
  * series, OLS linefit, Tukey/ctukey fences — driven through the KQL text
  * compiler so the multi-assign parse, the hidden-struct materialization,
  * and the component math are all on the hook. */
class SeriesDecomposeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def run(kql: String): Array[org.apache.spark.sql.Row] =
    graft.kql.KqlCompiler.compile(kql,
      _ => spark.range(1).toDF(), java.time.Instant.EPOCH, spark).collect()

  private def arr(r: org.apache.spark.sql.Row, i: Int): Seq[Double] =
    r.getSeq[Double](i)

  private def ≈(a: Seq[Double], b: Seq[Double]): Boolean =
    a.size == b.size && a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }

  test("seasonal: per-phase medians, period 2, trend 'avg' — hand computed") {
    // x = [0,10,0,10,20,10]: phase0 median(0,0,20)=0, phase1 median=10
    // seasonal=[0,10,0,10,0,10]; detr=[0,0,0,0,20,0]; avg trend = 20/6
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(0, 10, 0, 10, 20, 10)
        | | extend (b, s, t, r) = series_decompose(x, 2, 'avg')
        | | project b, s, t, r""".stripMargin)
    val m = 20.0 / 6
    assert(≈(arr(rows.head, 1), Seq(0, 10, 0, 10, 0, 10)))
    assert(≈(arr(rows.head, 2), Seq.fill(6)(m)))
    assert(≈(arr(rows.head, 0), Seq(m, 10 + m, m, 10 + m, m, 10 + m)))
    assert(≈(arr(rows.head, 3), Seq(-m, -m, -m, -m, 20 - m, -m)))
  }

  test("linefit trend: exact OLS recovery of a pure line, period 0") {
    // x = [0,1,2,3], no seasonality: slope 1, intercept 0 — exact
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(0, 1, 2, 3)
        | | extend (b, s, t, r) = series_decompose(x, 0, 'linefit')
        | | project b, s, t, r""".stripMargin)
    assert(≈(arr(rows.head, 0), Seq(0, 1, 2, 3)))
    assert(≈(arr(rows.head, 1), Seq(0, 0, 0, 0)))
    assert(≈(arr(rows.head, 2), Seq(0, 1, 2, 3)))
    assert(≈(arr(rows.head, 3), Seq(0, 0, 0, 0)))
  }

  test("series_outliers 'tukey': interpolated quartiles, IQR-unit scores") {
    // sorted 1..10: q25 = 3.25, q75 = 7.75, IQR = 4.5
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
        | | extend o = series_outliers(x, 'tukey')
        | | project o""".stripMargin)
    assert(≈(arr(rows.head, 0), Seq(
      (1 - 3.25) / 4.5, (2 - 3.25) / 4.5, (3 - 3.25) / 4.5, 0, 0, 0, 0,
      (8 - 7.75) / 4.5, (9 - 7.75) / 4.5, (10 - 7.75) / 4.5)))
  }

  test("series_decompose_anomalies: ctukey residual fences + flags") {
    // x = [5×9, 50], period 0, 'avg': mean 9.5, resid = [-4.5×9, 40.5]
    // ctukey q10 = -4.5, q90 = 0, IQR = 4.5 → scores [0×9, 9], flag on last
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(5, 5, 5, 5, 5, 5, 5, 5, 5, 50)
        | | extend (f, sc, b) = series_decompose_anomalies(x, 1.5, 0, 'avg')
        | | project f, sc, b""".stripMargin)
    assert(rows.head.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(≈(arr(rows.head, 1), Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 9)))
    assert(≈(arr(rows.head, 2), Seq.fill(10)(9.5)))
  }

  test("series_fit_line: exact recovery of a pure line + sample variances") {
    // x = [0,1,2,3]: slope 1, intercept 0, rsquare 1, rvariance 0,
    // variance = sample var = ((1.5²+0.5²)*2)/3 = 5/3
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(0, 1, 2, 3)
        | | extend (rsq, m, vr, rvr, b, lf) = series_fit_line(x)
        | | project rsq, m, vr, rvr, b, lf""".stripMargin)
    val r = rows.head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 5.0 / 3) < 1e-9)
    assert(math.abs(r.getDouble(3)) < 1e-9)
    assert(math.abs(r.getDouble(4)) < 1e-9)
    assert(≈(arr(r, 5), Seq(0, 1, 2, 3)))
  }

  test("series_fill family: hand-computed gap fills incl. edges") {
    import org.apache.spark.sql.functions.col
    val df = spark.sql("SELECT array(CAST(NULL AS DOUBLE), 1.0, NULL, NULL, 4.0, NULL) AS x")
    val out = df.select(
      graft.functions.SeriesDecompose.fillConst(col("x"), org.apache.spark.sql.functions.lit(-1)).as("fc"),
      graft.functions.SeriesDecompose.fillForward(col("x")).as("ff"),
      graft.functions.SeriesDecompose.fillBackward(col("x")).as("fb"),
      graft.functions.SeriesDecompose.fillLinear(col("x")).as("fl")).collect().head
    def a(i: Int): Seq[Any] = out.getSeq[Any](i)
    assert(a(0) == Seq(-1.0, 1.0, -1.0, -1.0, 4.0, -1.0))
    assert(a(1) == Seq(null, 1.0, 1.0, 1.0, 4.0, 4.0))   // leading null stays
    assert(a(2) == Seq(1.0, 1.0, 4.0, 4.0, 4.0, null))   // trailing null stays
    assert(a(3) == Seq(1.0, 1.0, 2.0, 3.0, 4.0, 4.0))    // interp + nearest edges
  }

  test("series_periods_detect: perfect period-3 series ranks lags 3 then 6") {
    // [1,5,2]×4: acf(3) = 3/4 of the full autocovariance = 0.75, acf(6) = 0.5
    val rows = run(
      """datatable(k: long)[1]
        | | extend x = pack_array(1, 5, 2, 1, 5, 2, 1, 5, 2, 1, 5, 2)
        | | extend (p, s) = series_periods_detect(x, 2, 8, 2)
        | | project p, s""".stripMargin)
    assert(≈(arr(rows.head, 0), Seq(3.0, 6.0)))
    assert(≈(arr(rows.head, 1), Seq(0.75, 0.5)))
  }

  test("period -1 (autodetect) fails loudly") {
    val e = intercept[Exception] {
      run(
        """datatable(k: long)[1]
          | | extend x = pack_array(1, 2, 3, 4)
          | | extend (b, s, t, r) = series_decompose(x, -1)
          | | project b""".stripMargin)
    }
    assert(e.getMessage.contains("autodetect") ||
      e.getCause != null && e.getCause.getMessage.contains("autodetect"))
  }
}
