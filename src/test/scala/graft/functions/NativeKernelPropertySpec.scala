package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the native scalar kernels (GeoPredOps,
  * SeriesFitOps, SeriesKernelOps) against INDEPENDENT re-derivations —
  * not the mirrored op order, but a different algebraic arrangement of
  * the same math — over seeded pseudo-random inputs. The compiler-level
  * golden specs pin exact values on fixtures; these pin that the tight
  * loops implement the right FORMULA across a few hundred random
  * shapes, so a future edit that keeps fixtures green but bends the
  * general case gets caught. */
class NativeKernelPropertySpec extends AnyFunSuite {

  private val rnd = new java.util.Random(0x5eed15L)
  private def arr(n: Int, lo: Double, hi: Double): Array[Double] =
    Array.fill(n)(lo + (hi - lo) * rnd.nextDouble())

  // ---- series_fit_line vs mean-centered OLS (different arrangement) ----
  test("fitLine matches mean-centered OLS on random series") {
    for (_ <- 1 to 200) {
      val n = 2 + rnd.nextInt(30)
      val xs = arr(n, -50, 50).map(java.lang.Double.valueOf)
      val f = SeriesFitOps.fitLine(xs, 0, n)
      val ys = xs.map(_.doubleValue())
      val xbar = (n - 1) / 2.0
      val ybar = ys.sum / n
      val sxy = ys.zipWithIndex.map { case (y, i) => (i - xbar) * (y - ybar) }.sum
      val sxx = (0 until n).map(i => (i - xbar) * (i - xbar)).sum
      val m = if (sxx == 0) 0.0 else sxy / sxx
      val b = ybar - m * xbar
      assert(math.abs(f.slope - m) < 1e-6, s"slope n=$n: ${f.slope} vs $m")
      assert(math.abs(f.interception - b) < 1e-6, s"icept n=$n")
      // rsquare via the residual definition
      val ssres = ys.zipWithIndex.map { case (y, i) => val e = y - (b + m * i); e * e }.sum
      val sstot = ys.map(y => (y - ybar) * (y - ybar)).sum
      val rsq = if (sstot == 0) 1.0 else 1.0 - ssres / sstot
      assert(math.abs(f.rsquare - rsq) < 1e-6, s"rsquare n=$n")
    }
  }

  // ---- fit2Lines vs brute-force split of independent per-segment OLS ----
  test("fit2Lines picks the split a brute-force two-OLS search picks") {
    def bruteRss(ys: Array[Double], from: Int, until: Int): Double = {
      val n = until - from
      val xbar = (from + until - 1) / 2.0 // global index mean of the segment
      val ybar = ys.slice(from, until).sum / n
      val sxy = (from until until).map(i => (i - xbar) * (ys(i) - ybar)).sum
      val sxx = (from until until).map(i => (i - xbar) * (i - xbar)).sum
      val m = if (sxx == 0) 0.0 else sxy / sxx
      val b = ybar - m * xbar
      (from until until).map { i => val e = ys(i) - (b + m * i); e * e }.sum
    }
    for (_ <- 1 to 100) {
      val n = 5 + rnd.nextInt(25)
      val ys = arr(n, -20, 20)
      val w = SeriesFitOps.fit2Lines(ys.map(java.lang.Double.valueOf))
      assert(w != null)
      val best = (2 to n - 2).minBy(s => bruteRss(ys, 0, s) + bruteRss(ys, s, n))
      val bestRss = bruteRss(ys, 0, best) + bruteRss(ys, best, n)
      // the kernel's winner achieves the same total RSS (ties can pick
      // a different but equally-good split only through FP noise —
      // compare the objective, not the index)
      assert(math.abs(w(1) - bestRss) < 1e-6 * math.max(1.0, bestRss),
        s"rss n=$n: ${w(1)} vs $bestRss (split ${w(0).toInt} vs $best)")
    }
  }

  // ---- periods: acf re-derivation + validate/detect agreement ----
  test("periods validate scores equal a naive ACF on random series") {
    for (_ <- 1 to 100) {
      val n = 6 + rnd.nextInt(40)
      val ys = arr(n, -10, 10)
      val mu = ys.sum / n
      val c = ys.map(_ - mu)
      val d = c.map(v => v * v).sum
      val l = 2 + rnd.nextInt(n - 3)
      val naive = math.max(0.0, (0 until n - l).map(i => c(i) * c(i + l)).sum / d)
      // drive through the expression-level kernel: centered + acf are
      // private, so recompute via the public fit on a validate call
      val expr = SeriesPeriods(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          ys, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal(l)), detect = false)
      val row = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val score = row.getArray(1).getDouble(0)
      assert(math.abs(score - naive) < 1e-9, s"acf n=$n l=$l")
    }
  }

  // ---- fills: idempotence, reversal duality, linear exactness ----
  test("fill kernels: idempotent, forward/backward dual under reversal") {
    def gappy(n: Int): Array[java.lang.Double] =
      Array.tabulate(n)(i =>
        if (rnd.nextDouble() < 0.4) null
        else java.lang.Double.valueOf(rnd.nextDouble() * 10))
    def run(mode: String, xs: Array[java.lang.Double]): Array[java.lang.Double] = {
      val expr = SeriesFillKernel(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          xs.map(x => if (x == null) null else x.doubleValue()),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = true)), mode)
      val out = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      Array.tabulate(xs.length)(i =>
        if (out.isNullAt(i)) null else java.lang.Double.valueOf(out.getDouble(i)))
    }
    for (_ <- 1 to 100) {
      val xs = gappy(3 + rnd.nextInt(20))
      for (mode <- Seq("forward", "backward", "linear")) {
        val once = run(mode, xs)
        assert(run(mode, once).toSeq == once.toSeq, s"$mode idempotent")
      }
      // forward(reverse(x)) == reverse(backward(x))
      assert(run("forward", xs.reverse).toSeq == run("backward", xs).reverse.toSeq)
      // linear fill hits the exact line between isolated neighbors
      val lin = run("linear", Array[java.lang.Double](
        java.lang.Double.valueOf(2.0), null, null, java.lang.Double.valueOf(8.0)))
      assert(lin.toSeq.map(_.doubleValue()) == Seq(2.0, 4.0, 6.0, 8.0))
    }
  }

  // ---- iir: a=[1] degenerates to FIR convolution ----
  test("iir with a=[1] equals direct FIR convolution") {
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(20)
      val x = arr(n, -5, 5)
      val b = arr(1 + rnd.nextInt(4), -2, 2)
      val expr = SeriesIirKernel(
        org.apache.spark.sql.catalyst.expressions.Literal.create(x,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))
      val out = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      for (i <- 0 until n) {
        val fir = b.indices.map(j => if (i - j >= 0) b(j) * x(i - j) else 0.0).sum
        assert(math.abs(out.getDouble(i) - fir) < 1e-9)
      }
    }
  }

  // ---- vector kernels: independent recomputation ----
  test("l2sq_d and jl_project match independent re-derivations") {
    def lit64(xs: Array[Double]) =
      org.apache.spark.sql.catalyst.expressions.Literal.create(xs,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false))
    // the sign matrix re-derived here from scratch (hex-string md5 —
    // a DIFFERENT digit extraction than the kernel's nibble compare)
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if ("01234567".contains(hex.head)) 1.0 else -1.0
    }
    for (_ <- 1 to 30) {
      val a = arr(64, -3, 3); val b = arr(64, -3, 3)
      val l2 = L2SqD(lit64(a), lit64(b)).eval(null).asInstanceOf[Double]
      val naive = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(l2 - naive) < 1e-9)
      val y = JlProject(lit64(a)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      for (j <- 0 until 16) {
        val expect = (0 until 64).map(i => a(i) * sign(i, j)).sum / 4.0
        assert(math.abs(y.getDouble(j) - expect) < 1e-9, s"jl dim $j")
      }
    }
    // short vectors are loudly null, never silently truncated
    assert(JlProject(lit64(arr(63, -1, 1))).eval(null) == null)
  }

  // ---- geo: predicate symmetry + distance/closest agreement ----
  test("geo kernels: intersect symmetry, closest point realizes the distance") {
    def lineJson(pts: Seq[(Double, Double)]): org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        s"""{"type":"LineString","coordinates":[${
          pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}""")
    for (_ <- 1 to 200) {
      def pt() = (rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 30 - 15)
      val a = lineJson(Seq(pt(), pt()))
      val b = lineJson(Seq(pt(), pt()))
      assert(GeoPredOps.intersects2Lines(a, b) == GeoPredOps.intersects2Lines(b, a))
      val (px, py) = pt()
      val line = lineJson(Seq(pt(), pt(), pt()))
      val d = GeoPredOps.distPointToLine(px, py, line)
      val foot = GeoPredOps.closestPointOnLine(px, py, line).toString
      val m = """\[(-?[\d.E-]+),(-?[\d.E-]+)\]""".r.findFirstMatchIn(foot).get
      val (fx, fy) = (m.group(1).toDouble, m.group(2).toDouble)
      // the foot sits on the line (distance ~0) and realizes d
      assert(GeoPredOps.distPointToLine(fx, fy, line) < 1e-3,
        s"foot off-line: $foot")
      val reach = GeoPredOps.segDist(px, py, fx, fy, fx, fy) // point distance
      assert(math.abs(reach - d) < 1e-3, s"|p->foot|=$reach vs d=$d")
    }
  }
}
