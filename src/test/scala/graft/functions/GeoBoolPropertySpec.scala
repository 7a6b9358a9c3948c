package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-16 geo construction kernels against
  * INDEPENDENT truths over seeded pseudo-random shapes (the
  * NativeKernelPropertySpec discipline): the boolean overlay vs
  * interval-logic areas/membership on lattice-offset rectangles, and
  * the buffers vs the exact spherical distance field. A future edit
  * that keeps the golden fixtures green but bends the general case
  * gets caught here. */
class GeoBoolPropertySpec extends AnyFunSuite {

  private val rnd = new java.util.Random(0xb001eaf1L)

  private def rectJson(x1: Double, y1: Double, x2: Double, y2: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$x1,$y1],[$x2,$y1],[$x2,$y2],[$x1,$y2],[$x1,$y1]]]}"""

  /** Independent CD rect area: R²·radians(Δx)·|sin y₂ − sin y₁| — a
    * DIFFERENT algebraic arrangement than ringAreaAbs's edge fold. */
  private def rectAreaCd(x1: Double, y1: Double, x2: Double, y2: Double): Double =
    6371009.0 * 6371009.0 * math.toRadians(x2 - x1) *
      math.abs(math.sin(math.toRadians(y2)) - math.sin(math.toRadians(y1)))

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("intersection/union of lattice-offset rectangles match interval logic") {
    var nonEmpty = 0
    for (_ <- 1 to 300) {
      // A on the .25 lattice, B on the .5 lattice: edges never collide,
      // vertices never sit on the other's edges — general position
      def pick(off: Double) = {
        val x1 = -20 + rnd.nextInt(30) + off
        val y1 = -15 + rnd.nextInt(20) + off
        (x1, y1, x1 + 1 + rnd.nextInt(12), y1 + 1 + rnd.nextInt(10))
      }
      val (ax1, ay1, ax2, ay2) = pick(0.25)
      val (bx1, by1, bx2, by2) = pick(0.5)
      val a = rectJson(ax1, ay1, ax2, ay2)
      val b = rectJson(bx1, by1, bx2, by2)
      val ix1 = math.max(ax1, bx1); val ix2 = math.min(ax2, bx2)
      val iy1 = math.max(ay1, by1); val iy2 = math.min(ay2, by2)
      val overlap = ix1 < ix2 && iy1 < iy2
      val inter = GeoBoolOps.intersection(u(a), u(b))
      val union = GeoBoolOps.union(u(a), u(b))
      assert((inter != null) == overlap, s"null/overlap disagree: $a vs $b")
      assert(union != null)
      val aArea = rectAreaCd(ax1, ay1, ax2, ay2)
      val bArea = rectAreaCd(bx1, by1, bx2, by2)
      if (overlap) {
        nonEmpty += 1
        val iTrue = rectAreaCd(ix1, iy1, ix2, iy2)
        val iGot = GeoPredOps.polygonArea(inter).doubleValue()
        assert(math.abs(iGot - iTrue) <= 1e-6 * iTrue + 1e-3, s"∩ area: $iGot vs $iTrue")
        val uGot = GeoPredOps.polygonArea(union).doubleValue()
        val uTrue = aArea + bArea - iTrue
        assert(math.abs(uGot - uTrue) <= 1e-6 * uTrue + 1e-3, s"∪ area: $uGot vs $uTrue")
      } else {
        val uGot = GeoPredOps.polygonArea(union).doubleValue()
        val uTrue = aArea + bArea
        assert(math.abs(uGot - uTrue) <= 1e-6 * uTrue + 1e-3, s"disjoint ∪: $uGot vs $uTrue")
      }
      // membership at lattice-offset probes (never on any boundary)
      for (_ <- 1 to 5) {
        val px = -22 + rnd.nextInt(35) + 0.125
        val py = -17 + rnd.nextInt(25) + 0.125
        val inA = px > ax1 && px < ax2 && py > ay1 && py < ay2
        val inB = px > bx1 && px < bx2 && py > by1 && py < by2
        if (inter != null)
          assert(GeoPredOps.pointInPolygon(px, py, inter).booleanValue() == (inA && inB),
            s"∩ membership at ($px,$py)")
        assert(GeoPredOps.pointInPolygon(px, py, union).booleanValue() == (inA || inB),
          s"∪ membership at ($px,$py)")
      }
    }
    assert(nonEmpty >= 30, s"fixture generator degenerated: only $nonEmpty overlaps")
  }

  test("line buffer membership matches the exact distance field on random polylines") {
    for (_ <- 1 to 40) {
      // 2-4 segment polyline near the equator, vertices on the .25 grid
      val n = 3 + rnd.nextInt(2)
      val xs = new Array[Double](n); val ys = new Array[Double](n)
      xs(0) = -2 + rnd.nextInt(2) + 0.25; ys(0) = -1 + rnd.nextInt(2) + 0.25
      for (i <- 1 until n) {
        xs(i) = xs(i - 1) + 0.5 + rnd.nextInt(2) * 0.5
        ys(i) = math.max(-1.75, math.min(1.75, ys(i - 1) + (rnd.nextInt(3) - 1) * 0.5))
      }
      val line = s"""{"type":"LineString","coordinates":[${
        (0 until n).map(i => s"[${xs(i)},${ys(i)}]").mkString(",")}]}"""
      val r = 15000.0
      val buf = GeoBufferOps.lineBuffer(u(line), r, 100.0)
      if (buf != null) { // sharp joints may be loudly null — that's the pin
        for (_ <- 1 to 30) {
          val px = xs(0) - 1 + 4 * rnd.nextDouble()
          val py = -2.5 + 5 * rnd.nextDouble()
          val d = GeoPredOps.distPointToLine(px, py, u(line)).doubleValue()
          if (math.abs(d - r) > 0.05 * r) { // outside the tolerance band
            val in = GeoPredOps.pointInPolygon(px, py, buf).booleanValue()
            assert(in == (d < r), s"buffer membership at ($px,$py): d=$d r=$r in=$in\n$line")
          }
        }
      }
    }
  }

  test("polygon buffer membership matches distance-to-polygon on random rects with holes") {
    for (_ <- 1 to 40) {
      val x1 = -10 + rnd.nextInt(10) + 0.25; val y1 = -5 + rnd.nextInt(5) + 0.25
      val x2 = x1 + 2 + rnd.nextInt(5); val y2 = y1 + 2 + rnd.nextInt(4)
      val hx1 = x1 + 0.5; val hy1 = y1 + 0.5
      val hx2 = math.min(x2 - 0.5, hx1 + 1.0); val hy2 = math.min(y2 - 0.5, hy1 + 1.0)
      val poly =
        s"""{"type":"Polygon","coordinates":[[[$x1,$y1],[$x2,$y1],[$x2,$y2],[$x1,$y2],[$x1,$y1]],
            [[$hx1,$hy1],[$hx2,$hy1],[$hx2,$hy2],[$hx1,$hy2],[$hx1,$hy1]]]}""".replaceAll("\\s", "")
      val r = 12000.0
      val buf = GeoBufferOps.polygonBuffer(u(poly), r, 80.0)
      assert(buf != null, s"buffer unexpectedly null for $poly")
      for (_ <- 1 to 30) {
        val px = x1 - 1 + (x2 - x1 + 2) * rnd.nextDouble()
        val py = y1 - 1 + (y2 - y1 + 2) * rnd.nextDouble()
        val d = GeoPredOps.distPointToPolygon(px, py, u(poly)).doubleValue()
        if (math.abs(d - r) > 0.05 * r) {
          val in = GeoPredOps.pointInPolygon(px, py, buf).booleanValue()
          assert(in == (d < r), s"poly-buffer membership at ($px,$py): d=$d in=$in\n$poly")
        }
      }
    }
  }
}
