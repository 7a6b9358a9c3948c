package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class FftSpec extends AnyFunSuite {
  private def naiveDft(x: Array[Double], y: Array[Double], inverse: Boolean): (Array[Double], Array[Double]) = {
    val n = x.length
    val s = if (inverse) 2.0 * math.Pi / n else -2.0 * math.Pi / n
    val or = new Array[Double](n); val oi = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val a = s * k * t
      or(k) += x(t) * math.cos(a) - y(t) * math.sin(a)
      oi(k) += x(t) * math.sin(a) + y(t) * math.cos(a)
    }
    if (inverse) for (k <- 0 until n) { or(k) /= n; oi(k) /= n }
    (or, oi)
  }
  private def approxArr(a: Array[Double], b: Array[Double], tol: Double = 1e-9): Unit = {
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= tol, s"$x vs $y") }
  }

  test("radix-2: constant → DC spike; single tone → symmetric spikes") {
    val n = 8
    val (cr, ci) = Fft.dft(Array.fill(n)(3.0), new Array[Double](n), inverse = false)
    approxArr(cr, Array(24.0, 0, 0, 0, 0, 0, 0, 0))
    approxArr(ci, new Array[Double](n))
    // cos(2π·2t/8): spikes n/2 = 4 at bins 2 and 6
    val tone = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * 2 * t / n))
    val (tr, ti) = Fft.dft(tone, new Array[Double](n), inverse = false)
    approxArr(tr, Array(0, 0, 4.0, 0, 0, 0, 4.0, 0))
    approxArr(ti, new Array[Double](n))
  }

  test("Bluestein lengths match the naive DFT; round trip is exact") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 3, 5, 6, 7, 12, 30, 100)) {
      val x = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val y = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val (fr, fi) = Fft.dft(x, y, inverse = false)
      val (nr, ni) = naiveDft(x, y, inverse = false)
      approxArr(fr, nr, 1e-8); approxArr(fi, ni, 1e-8)
      val (br, bi) = Fft.dft(fr, fi, inverse = true)
      approxArr(br, x, 1e-9); approxArr(bi, y, 1e-9)
      // Parseval: Σ|x|² = Σ|X|²/n
      val lhs = x.zip(y).map { case (a, b) => a * a + b * b }.sum
      val rhs = fr.zip(fi).map { case (a, b) => a * a + b * b }.sum / n
      assert(math.abs(lhs - rhs) <= 1e-7 * math.max(1.0, lhs))
    }
  }

  test("KQL surface: multi-assign fft/ifft round trip, imaginary input") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    try {
      import spark.implicits._
      val df = Seq((1L, "a")).toDF("id", "tag")
      val out = graft.kql.KqlCompiler.compile(
        """t | extend s = pack_array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
          | | extend (fr, fi) = series_fft(s)
          | | extend (br, bi) = series_ifft(fr, fi)
          | | extend dc = round(fr[0], 9),
          |          rt = round(series_sum(series_abs(series_subtract(s, br))), 9),
          |          rti = round(series_sum(series_abs(bi)), 9)
          | | project dc, rt, rti""".stripMargin, _ => df).head()
      assert(out.getDouble(0) == 21.0)
      assert(out.getDouble(1) == 0.0 && out.getDouble(2) == 0.0)
    } finally spark.stop()
  }
}
