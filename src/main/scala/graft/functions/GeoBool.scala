package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_intersection_2polygons` / `geo_union_2polygons` — general
  * polygon boolean construction (Greiner–Hormann / Weiler–Atherton
  * class), replacing the round-15 convex-clip subset (GeoClip.scala,
  * retired).
  *
  * Algorithm (planar lon/lat — the geo ring's even-odd stance; per-row
  * geometries are tens-to-hundreds of vertices, so the O(n·m) pairwise
  * split is the right trade against sweep-line bookkeeping):
  *
  *  1. parse both operands (Polygon or MultiPolygon, holes allowed),
  *     normalize ring orientation (outers CCW, holes CW by signed area);
  *  2. split every edge of A at its transversal crossings with edges of
  *     B and vice versa — the crossing point is computed ONCE per edge
  *     pair and shared, so stitching can match endpoints exactly;
  *  3. classify each sub-edge by its midpoint against the OTHER side
  *     (even-odd over all rings): intersection keeps inside sub-edges of
  *     both sides, union keeps outside sub-edges of both sides — the
  *     even-odd selection rule makes holes, containment, and
  *     multi-component inputs fall out uniformly (a B hole inside A
  *     becomes a hole of A∩B; an island in a lake unions to a
  *     MultiPolygon; A⊂B intersects to A verbatim);
  *  4. stitch selected directed sub-edges into closed rings by exact
  *     endpoint adjacency; signed area > 0 ⇒ outer, < 0 ⇒ hole; each
  *     hole attaches to the innermost containing outer;
  *  5. one outer ⇒ Polygon, several ⇒ MultiPolygon, none ⇒ null (the
  *     empty intersection keeps round 15's loudly-null stance).
  *
  * DEGENERATE CONTACT (round 18 — previously loudly null): vertex-on-
  * vertex, vertex-on-edge, and collinear-overlap contact between the
  * operands are handled exactly when the shared geometry is
  * bit-identical (the snapped/gridded-data case): touching contacts
  * split the touched edge at the toucher's exact vertex, collinear
  * overlaps decompose into exactly coincident sub-edges that the
  * selection pass pairs by coordinate equality (same direction → one
  * boundary copy kept for both results; opposite directions → interior
  * to the union, zero-width pinch of the intersection, dropped), and
  * stitching resolves pinch-point junctions by planar-face traversal
  * (first outgoing edge clockwise from the reversed incoming).
  * SNAP-ROUNDING (round 19): operand coordinates quantize to a 1e-9°
  * grid before the split pass, so NEARLY-degenerate contact — FP-noisy
  * collinearity from computed (mixed-provenance) coordinates — becomes
  * the bit-identical case above and resolves exactly; ≤9-decimal
  * literals round-trip the grid unchanged. What remains loudly null:
  * post-snap leftovers (a ring collapsing to zero area, any leftover
  * open walk).
  * Kusto computes geodesic-edge booleans; this engine is the
  * planar-edge subset consistent with geo_point_in_polygon /
  * geo_polygon_area (reference surface: the connector emits no geo KQL
  * — north-star scope beyond it/KustoSinkIT.java:269-271).
  */
object GeoBoolOps {
  private val mappers = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Snap-rounding grid (round 19): every OPERAND coordinate quantizes
    * to 1e-9° (≈0.1 mm at the equator) before the split pass, so
    * FP-NOISY near-degenerate contact — a shared border carried as
    * computed, not snapped, coordinates a few ulps apart — becomes the
    * bit-identical case the round-18 degenerate-contact engine handles
    * exactly. Literals with ≤9 decimal digits round-trip the grid
    * unchanged (rint(c·1e9)/1e9 re-rounds to the same nearest double),
    * so already-gridded data and every emitted split point (computed
    * from snapped operands) are untouched. The `+ 0.0` folds rint's
    * -0.0 to +0.0 for the boxed-tuple machinery; coordinates outside
    * ±9.0e6 (not lon/lat — garbage input; the bound keeps c·1e9 under
    * 2^53 so the grid product is itself exact) skip the grid to avoid
    * overflow. Post-snap leftovers keep the loudly-null stance: a
    * segment collapsing to zero length is skipped, a ring collapsing to
    * zero area nulls in parseSide, and a leftover open walk still
    * throws Degenerate. */
  private val SnapCells = 1e9
  private def snap(c: Double): Double =
    if (Math.abs(c) <= 9.0e6) Math.rint(c * SnapCells) / SnapCells + 0.0 else c + 0.0

  /** In-place snap of a parsed polyline (the line ops' operand form). */
  private def snapLine(a: Array[Double]): Array[Double] = {
    if (a == null) return null
    var i = 0
    while (i < a.length) { a(i) = snap(a(i)); i += 1 }
    a
  }

  /** Parse Polygon or MultiPolygon to rings in OPEN form (closure vertex
    * stripped), orientation normalized: ring-0-of-component CCW, holes
    * CW. Returns null on malformed/unsupported input. */
  def parseSide(json: String): Array[Array[Double]] = {
    try {
      val root = mappers.get().readTree(json)
      if (root == null || root.get("type") == null) return null
      val t = root.get("type").asText()
      val cs = root.get("coordinates")
      if (cs == null || !cs.isArray || cs.size() == 0) return null
      val polys: Seq[com.fasterxml.jackson.databind.JsonNode] =
        if ("Polygon".equals(t)) Seq(cs)
        else if ("MultiPolygon".equals(t)) (0 until cs.size()).map(cs.get)
        else return null
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      for (poly <- polys) {
        if (!poly.isArray || poly.size() == 0) return null
        var r = 0
        while (r < poly.size()) {
          val ring = poly.get(r)
          if (ring == null || !ring.isArray || ring.size() < 3) return null
          val flat = new Array[Double](2 * ring.size())
          var i = 0
          while (i < ring.size()) {
            val p = ring.get(i)
            if (p == null || !p.isArray || p.size() < 2 ||
                !p.get(0).isNumber || !p.get(1).isNumber) return null
            // snap() quantizes to the 1e-9° grid AND normalizes -0.0 to
            // +0.0: downstream shared-boundary pairing (selectedJoint)
            // and stitching key on BOXED tuple equality, under which
            // -0.0 != 0.0 even though the doubles compare ==. Split
            // points computed later can't reintroduce -0.0 (x−x and
            // a+(−a) round to +0.0; t·dx with t∈(0,1) on geo-scale
            // coords never underflows).
            flat(2 * i) = snap(p.get(0).asDouble())
            flat(2 * i + 1) = snap(p.get(1).asDouble())
            i += 1
          }
          val opened = open(flat)
          if (opened.length < 6) return null
          val wantCcw = r == 0 // component outer CCW, holes CW
          val a2 = signedArea2(opened)
          if (a2 == 0.0) return null // degenerate ring
          out += (if ((a2 > 0) == wantCcw) opened else reverse(opened))
          r += 1
        }
      }
      out.toArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def open(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    if (n >= 2 && ring(0) == ring(2 * n - 2) && ring(1) == ring(2 * n - 1))
      ring.take(2 * n - 2)
    else ring
  }

  def signedArea2(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
      i += 1
    }
    s
  }

  private def reverse(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    val out = new Array[Double](ring.length)
    var i = 0
    while (i < n) {
      out(2 * i) = ring(2 * (n - 1 - i)); out(2 * i + 1) = ring(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Even-odd crossing parity of the upward ray from (px,py) over all
    * rings of a side — the membership test the classifier uses. */
  private def evenOdd(rings: Array[Array[Double]], px: Double, py: Double): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if ((yi > py) != (yj > py) &&
            px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  private final class Degenerate extends RuntimeException

  /** Directed edge endpoints plus the (t-sorted) split points collected
    * against the other side's edges. */
  private final class Edge(val x1: Double, val y1: Double,
                           val x2: Double, val y2: Double) {
    var splits: scala.collection.mutable.ArrayBuffer[(Double, Double, Double)] = null
    def addSplit(t: Double, x: Double, y: Double): Unit = {
      if (splits == null) splits = scala.collection.mutable.ArrayBuffer.empty
      splits += ((t, x, y))
    }
  }

  private def edgesOf(rings: Array[Array[Double]]): Array[Edge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Edge]
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        out += new Edge(ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1))
        i += 1
      }
      r += 1
    }
    out.toArray
  }

  /** Pairwise split pass (round 18: degenerate contact is HANDLED, not
    * thrown). Transversal interior crossings split both edges at the
    * SAME computed point. Touching contact splits whichever edge is
    * touched in its INTERIOR at the toucher's exact vertex coordinates
    * (never the re-derived t-point, so later exact-endpoint matching
    * holds); vertex-on-vertex needs no split. Collinear overlap splits
    * each edge at the other's endpoints that fall strictly inside it -
    * after this pass, overlapping boundary runs decompose into EXACTLY
    * coincident sub-edges (all endpoints are original vertices of one
    * operand), which the selection pass pairs up by coordinate
    * equality. FP caveat: truly-collinear contact is detected by an
    * exact cross-product zero - the snapped/gridded-data case this
    * upgrade targets, where shared coordinates are bit-identical. */
  private def splitAll(ea: Array[Edge], eb: Array[Edge]): Unit = {
    var i = 0
    while (i < ea.length) {
      val p = ea(i)
      val dx = p.x2 - p.x1; val dy = p.y2 - p.y1
      var k = 0
      // zero-length p edge (repeated consecutive ring vertex): skip — it
      // would pass the collinearity test against EVERY q (both cross
      // terms vanish) and split q at a vertex not on q at all. Its
      // vertex's real contacts are found through the adjacent non-zero
      // edges. A zero-length q is already safe: the collinear branch
      // splits p at q's vertex exactly, and q's own params reject as
      // Inf/NaN.
      while (k < eb.length && (dx != 0.0 || dy != 0.0)) {
        val q = eb(k)
        val ex = q.x2 - q.x1; val ey = q.y2 - q.y1
        val denom = dx * ey - dy * ex
        val wx = q.x1 - p.x1; val wy = q.y1 - p.y1
        if (denom == 0.0) {
          if (wx * dy - wy * dx == 0.0) {
            // collinear: split each edge at the other's interior-strict
            // endpoints (parameters along the dominant axis)
            def param(px: Double, py: Double, e: Edge, edx: Double, edy: Double): Double =
              if (Math.abs(edx) >= Math.abs(edy)) (px - e.x1) / edx else (py - e.y1) / edy
            val tq1 = param(q.x1, q.y1, p, dx, dy)
            if (tq1 > 0.0 && tq1 < 1.0) p.addSplit(tq1, q.x1, q.y1)
            val tq2 = param(q.x2, q.y2, p, dx, dy)
            if (tq2 > 0.0 && tq2 < 1.0) p.addSplit(tq2, q.x2, q.y2)
            val up1 = param(p.x1, p.y1, q, ex, ey)
            if (up1 > 0.0 && up1 < 1.0) q.addSplit(up1, p.x1, p.y1)
            val up2 = param(p.x2, p.y2, q, ex, ey)
            if (up2 > 0.0 && up2 < 1.0) q.addSplit(up2, p.x2, p.y2)
          }
        } else {
          val t = (wx * ey - wy * ex) / denom
          val u = (wx * dy - wy * dx) / denom
          if (t > 0.0 && t < 1.0 && u > 0.0 && u < 1.0) {
            val x = p.x1 + t * dx; val y = p.y1 + t * dy
            p.addSplit(t, x, y)
            q.addSplit(u, x, y)
          } else if (t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0) {
            // touching contact: split the touched interior at the
            // toucher's EXACT vertex (vertex-on-vertex: no split)
            if (t > 0.0 && t < 1.0) {
              val (cx, cy) = if (u == 0.0) (q.x1, q.y1) else (q.x2, q.y2)
              p.addSplit(t, cx, cy)
            } else if (u > 0.0 && u < 1.0) {
              val (cx, cy) = if (t == 0.0) (p.x1, p.y1) else (p.x2, p.y2)
              q.addSplit(u, cx, cy)
            }
          }
        }
        k += 1
      }
      i += 1
    }
  }

  /** Split an edge list into its directed sub-edges (zero-length
    * fragments dropped). */
  private def subEdges(edges: Array[Edge]): Array[(Double, Double, Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    var i = 0
    while (i < edges.length) {
      val e = edges(i)
      val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]((e.x1, e.y1))
      if (e.splits != null) {
        val s = e.splits.sortBy(_._1)
        var k = 0
        while (k < s.length) { pts += ((s(k)._2, s(k)._3)); k += 1 }
      }
      pts += ((e.x2, e.y2))
      var k = 0
      while (k < pts.length - 1) {
        val (ax, ay) = pts(k); val (bx, by) = pts(k + 1)
        if (ax != bx || ay != by) out += ((ax, ay, bx, by))
        k += 1
      }
      i += 1
    }
    out.toArray
  }

  /** Joint selection over BOTH sides' sub-edges (round 18).
    *
    * Shared-boundary sub-edges (exactly coincident after the split
    * pass) pair up by coordinate equality. With outers CCW and holes
    * CW, each polygon's interior lies LEFT of every directed edge, so:
    * a pair in the SAME direction has both interiors on one side - the
    * segment is boundary of BOTH results, kept once (the A copy); a
    * pair in OPPOSITE directions has the interiors facing away - the
    * segment is interior to the union and a zero-width pinch of the
    * intersection, dropped from both. Unpaired sub-edges classify by
    * midpoint even-odd against the other side exactly as before (after
    * full splitting a midpoint can no longer sit ON the other
    * boundary).
    *
    * The pairing keys on BOXED tuple equality, under which -0.0 != 0.0:
    * parseSide normalizes -0.0 to +0.0 at parse time and split-point
    * arithmetic cannot reintroduce it, so coincident sub-edges always
    * hash equal. Duplicate coincident sub-edges WITHIN one side would
    * collapse to one set entry — that requires a self-overlapping ring,
    * which is invalid input (garbage-in tolerated, not modeled). */
  private def selectedJoint(subsA: Array[(Double, Double, Double, Double)],
                            subsB: Array[(Double, Double, Double, Double)],
                            pa: Array[Array[Double]], pb: Array[Array[Double]],
                            keepInside: Boolean): Array[(Double, Double, Double, Double)] = {
    val bByDir = new java.util.HashSet[(Double, Double, Double, Double)]()
    var i = 0
    while (i < subsB.length) { bByDir.add(subsB(i)); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    i = 0
    while (i < subsA.length) {
      val sa = subsA(i)
      if (bByDir.contains(sa)) {
        out += sa // same-direction shared boundary: keep once
      } else if (bByDir.contains((sa._3, sa._4, sa._1, sa._2))) {
        () // opposite-direction contact: interior to union, pinch of intersection
      } else {
        val in = evenOdd(pb, (sa._1 + sa._3) / 2, (sa._2 + sa._4) / 2)
        if (in == keepInside) out += sa
      }
      i += 1
    }
    val aByDir = new java.util.HashSet[(Double, Double, Double, Double)]()
    i = 0
    while (i < subsA.length) { aByDir.add(subsA(i)); i += 1 }
    i = 0
    while (i < subsB.length) {
      val sb = subsB(i)
      if (aByDir.contains(sb) || aByDir.contains((sb._3, sb._4, sb._1, sb._2))) {
        () // already handled from the A side
      } else {
        val in = evenOdd(pa, (sb._1 + sb._3) / 2, (sb._2 + sb._4) / 2)
        if (in == keepInside) out += sb
      }
      i += 1
    }
    out.toArray
  }

  /** Stitch directed sub-edges into closed rings by exact endpoint
    * match. At a junction vertex (several available continuations - a
    * vertex-touch pinch point) take the outgoing edge with the SMALLEST
    * counterclockwise turn from the incoming direction: the interior
    * stays LEFT of the boundary, so the tightest left turn walks the
    * same face corner and two regions touching at a point come back as
    * two simple rings, never a figure-eight. A remaining open walk is
    * still degenerate (loudly null). */
  private def stitch(subs: Array[(Double, Double, Double, Double)]): Array[Array[Double]] = {
    val bySrc = new java.util.HashMap[(Double, Double),
      scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < subs.length) {
      val key = (subs(i)._1, subs(i)._2)
      var b = bySrc.get(key)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty; bySrc.put(key, b) }
      b += i
      i += 1
    }
    // planar-face traversal order: clockwise sweep angle in (0, 2pi]
    // from the REVERSED incoming direction to a candidate outgoing
    // direction; the smallest wins (an exact U-turn maps to 2pi, last)
    def cwFromReversed(inx: Double, iny: Double, ox: Double, oy: Double): Double = {
      val d = Math.atan2(-iny, -inx) - Math.atan2(oy, ox)
      if (d <= 0) d + 2 * Math.PI else if (d > 2 * Math.PI) d - 2 * Math.PI else d
    }
    val used = new Array[Boolean](subs.length)
    val rings = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    i = 0
    while (i < subs.length) {
      if (!used(i)) {
        val pts = scala.collection.mutable.ArrayBuffer.empty[Double]
        val start = (subs(i)._1, subs(i)._2)
        var cur = i
        var guard = 0
        var done = false
        while (!done) {
          if (guard > subs.length) throw new Degenerate
          guard += 1
          used(cur) = true
          pts += subs(cur)._1; pts += subs(cur)._2
          val nxtKey = (subs(cur)._3, subs(cur)._4)
          if (nxtKey == start) done = true
          else {
            val cands = bySrc.get(nxtKey)
            if (cands == null) throw new Degenerate
            val avail = cands.filterNot(used)
            if (avail.isEmpty) throw new Degenerate
            val inx = subs(cur)._3 - subs(cur)._1
            val iny = subs(cur)._4 - subs(cur)._2
            cur =
              if (avail.length == 1) avail.head
              else avail.minBy { c =>
                cwFromReversed(inx, iny, subs(c)._3 - subs(c)._1, subs(c)._4 - subs(c)._2)
              }
          }
        }
        if (pts.length >= 6) rings += pts.toArray
      }
      i += 1
    }
    rings.toArray
  }

  private def emitRing(sb: java.lang.StringBuilder, ring: Array[Double]): Unit = {
    sb.append('[')
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append('[').append(ring(2 * i)).append(',').append(ring(2 * i + 1)).append(']')
      i += 1
    }
    sb.append(",[").append(ring(0)).append(',').append(ring(1)).append(']')
    sb.append(']')
  }

  private def assemble(rings: Array[Array[Double]]): UTF8String = {
    val outers = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Double)]
    val holes = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < rings.length) {
      val a2 = signedArea2(rings(i))
      if (a2 > 0) outers += ((rings(i), a2))
      else if (a2 < 0) holes += rings(i)
      i += 1
    }
    if (outers.isEmpty) return null
    // each hole attaches to the innermost (smallest-area) containing outer
    val byOuter = Array.fill(outers.length)(
      scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
    for (h <- holes) {
      // probe candidates: each vertex AND each edge midpoint - a hole
      // produced by a degenerate contact may have vertices ON its
      // outer's boundary, where even-odd is unreliable; the first probe
      // that lands strictly inside some outer decides
      val hn = h.length / 2
      var best = -1; var bestArea = Double.MaxValue
      var probe = 0
      while (best < 0 && probe < 2 * hn) {
        val (px, py) =
          if (probe < hn) (h(2 * probe), h(2 * probe + 1))
          else {
            val a = probe - hn; val b = (a + 1) % hn
            ((h(2 * a) + h(2 * b)) / 2, (h(2 * a + 1) + h(2 * b + 1)) / 2)
          }
        var o = 0
        while (o < outers.length) {
          if (evenOdd(Array(outers(o)._1), px, py) && outers(o)._2 < bestArea) {
            best = o; bestArea = outers(o)._2
          }
          o += 1
        }
        probe += 1
      }
      if (best < 0) throw new Degenerate
      byOuter(best) += h
    }
    val sb = new java.lang.StringBuilder(128)
    if (outers.length == 1) {
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      emitRing(sb, outers(0)._1)
      for (h <- byOuter(0)) { sb.append(','); emitRing(sb, h) }
      sb.append("]}")
    } else {
      sb.append("{\"type\":\"MultiPolygon\",\"coordinates\":[")
      var o = 0
      while (o < outers.length) {
        if (o > 0) sb.append(',')
        sb.append('[')
        emitRing(sb, outers(o)._1)
        for (h <- byOuter(o)) { sb.append(','); emitRing(sb, h) }
        sb.append(']')
        o += 1
      }
      sb.append("]}")
    }
    UTF8String.fromString(sb.toString)
  }

  private def boolOp(aJson: UTF8String, bJson: UTF8String,
                     keepInside: Boolean): UTF8String = {
    try {
      val pa = parseSide(aJson.toString)
      val pb = parseSide(bJson.toString)
      if (pa == null || pb == null) return null
      val ea = edgesOf(pa)
      val eb = edgesOf(pb)
      splitAll(ea, eb)
      val subs = selectedJoint(subEdges(ea), subEdges(eb), pa, pb, keepInside)
      if (subs.isEmpty) return null
      assemble(stitch(subs))
    } catch {
      case _: Degenerate => null
      case scala.util.control.NonFatal(_) => null
    }
  }

  def intersection(a: UTF8String, b: UTF8String): UTF8String = boolOp(a, b, keepInside = true)
  def union(a: UTF8String, b: UTF8String): UTF8String = boolOp(a, b, keepInside = false)

  /** `geo_union_polygons_array` — left-to-right fold of the pairwise
    * union over the member polygons (each step's MultiPolygon output
    * feeds the next as an operand); bit-identical degenerate contact
    * between members (shared edges, vertex-on-edge) is handled by the
    * round-18 pairwise rules, near-degenerate contact stays loudly
    * null. */
  def unionArray(arr: Array[String]): UTF8String = {
    if (arr == null || arr.isEmpty) return null
    try {
      // validate every member parses before folding
      if (arr.exists(s => parseSide(s) == null)) return null
      var acc = UTF8String.fromString(arr(0))
      var i = 1
      while (i < arr.length) {
        acc = union(acc, UTF8String.fromString(arr(i)))
        if (acc == null) return null
        i += 1
      }
      acc
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** `geo_intersection_line_with_polygon` — the line CLIPPED to the
    * polygon: every line segment splits at its transversal crossings
    * with the polygon boundary, inside sub-segments (midpoint even-odd)
    * survive, consecutive survivors stitch back into chains. One chain
    * → LineString, several → MultiLineString, none → null. Degenerate
    * contact (round 18): touching contact (a line or polygon vertex on
    * the other's interior) just splits the line at the contact
    * parameter; a collinear boundary-riding run is INCLUDED in the
    * intersection (the polygon is a closed region) — both previously
    * loudly null. */
  def lineClip(lineJson: UTF8String, polyJson: UTF8String): UTF8String = {
    try {
      val line = snapLine(GeoPredOps.parseLine(lineJson.toString))
      val poly = parseSide(polyJson.toString)
      if (line == null || poly == null) return null
      val pe = edgesOf(poly)
      val n = line.length / 2
      val chains = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Double]]
      var cur: scala.collection.mutable.ArrayBuffer[Double] = null
      var i = 0
      while (i < n - 1) {
        val x1 = line(2 * i); val y1 = line(2 * i + 1)
        val x2 = line(2 * i + 2); val y2 = line(2 * i + 3)
        val dx = x2 - x1; val dy = y2 - y1
        // zero-length segment (repeated consecutive vertex, parseLine
        // does not dedupe): skip — it adds no geometry, and letting it
        // through makes the collinearity test below trivially true for
        // EVERY edge (dx=dy=0 ⇒ denom=0 and the cross term 0) with
        // param() dividing by zero, forcing a bogus inside run at a
        // point that may lie outside the polygon
        if (dx != 0.0 || dy != 0.0) {
        // collect crossing parameters with every polygon edge.
        // Degenerate contact (round 18, previously loudly null): a
        // touching contact just splits the line at the contact
        // parameter; a collinear overlap records its t-interval as a
        // FORCED-inside run - the polygon is a closed region, so a line
        // riding the boundary is part of the intersection (the even-odd
        // midpoint test is meaningless exactly there)
        val ts = scala.collection.mutable.ArrayBuffer[Double](0.0, 1.0)
        val forced = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        var k = 0
        while (k < pe.length) {
          val q = pe(k)
          val ex = q.x2 - q.x1; val ey = q.y2 - q.y1
          val denom = dx * ey - dy * ex
          val wx = q.x1 - x1; val wy = q.y1 - y1
          if (denom == 0.0) {
            if (wx * dy - wy * dx == 0.0) {
              def param(px: Double, py: Double): Double =
                if (Math.abs(dx) >= Math.abs(dy)) (px - x1) / dx else (py - y1) / dy
              val t1 = param(q.x1, q.y1); val t2 = param(q.x2, q.y2)
              val lo = Math.max(0.0, Math.min(t1, t2))
              val hi = Math.min(1.0, Math.max(t1, t2))
              if (lo < hi) {
                forced += ((lo, hi))
                if (lo > 0.0 && lo < 1.0) ts += lo
                if (hi > 0.0 && hi < 1.0) ts += hi
              }
            }
          } else {
            val t = (wx * ey - wy * ex) / denom
            val u = (wx * dy - wy * dx) / denom
            if (t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0) {
              // interior crossing AND touching contact both split the
              // line at t (a touch at the line's own vertex needs none)
              if (t > 0.0 && t < 1.0) ts += t
            }
          }
          k += 1
        }
        val sorted = ts.distinct.sorted
        var s = 0
        while (s < sorted.length - 1) {
          val ta = sorted(s); val tb = sorted(s + 1)
          val tm = (ta + tb) / 2
          val mx = x1 + tm * dx; val my = y1 + tm * dy
          if (forced.exists(f => tm >= f._1 && tm <= f._2) || evenOddPub(poly, mx, my)) {
            val ax = x1 + ta * dx; val ay = y1 + ta * dy
            val bx = x1 + tb * dx; val by = y1 + tb * dy
            if (cur != null && cur(cur.length - 2) == ax && cur(cur.length - 1) == ay) {
              cur += bx; cur += by
            } else {
              cur = scala.collection.mutable.ArrayBuffer(ax, ay, bx, by)
              chains += cur
            }
          }
          s += 1
        }
        } // end zero-length-segment guard
        i += 1
      }
      if (chains.isEmpty) return null
      val sb = new java.lang.StringBuilder(128)
      def emitChain(c: scala.collection.mutable.ArrayBuffer[Double]): Unit = {
        sb.append('[')
        var j = 0
        while (j < c.length / 2) {
          if (j > 0) sb.append(',')
          sb.append('[').append(c(2 * j)).append(',').append(c(2 * j + 1)).append(']')
          j += 1
        }
        sb.append(']')
      }
      if (chains.length == 1) {
        sb.append("{\"type\":\"LineString\",\"coordinates\":")
        emitChain(chains(0))
        sb.append("}")
      } else {
        sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
        for (c <- chains.indices) { if (c > 0) sb.append(','); emitChain(chains(c)) }
        sb.append("]}")
      }
      UTF8String.fromString(sb.toString)
    } catch {
      case _: Degenerate => null
      case scala.util.control.NonFatal(_) => null
    }
  }

  private def evenOddPub(rings: Array[Array[Double]], px: Double, py: Double): Boolean =
    evenOdd(rings, px, py)

  /** `geo_intersection_2lines` — the intersection of two polylines in
    * first-line-then-parameter order. Transversal interior crossings
    * yield points; round 18 adds the degenerate contacts (previously
    * loudly null): endpoint/vertex TOUCH contact yields the exact
    * contact point (the touching vertex's own coordinates), and a
    * collinear OVERLAP yields the shared segment. Output: only points →
    * Point/MultiPoint, only segments → LineString/MultiLineString (one
    * 2-point chain per overlap run), both → GeometryCollection
    * [lines, points]. Points duplicated by adjacent-segment touches or
    * lying on an emitted overlap run are deduplicated/absorbed. None →
    * null. */
  def lineIntersect(aJson: UTF8String, bJson: UTF8String): UTF8String = {
    try {
      val a = snapLine(GeoPredOps.parseLine(aJson.toString))
      val b = snapLine(GeoPredOps.parseLine(bJson.toString))
      if (a == null || b == null) return null
      val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val segs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
      val n = a.length / 2; val m = b.length / 2
      var i = 0
      while (i < n - 1) {
        val x1 = a(2 * i); val y1 = a(2 * i + 1)
        val dx = a(2 * i + 2) - x1; val dy = a(2 * i + 3) - y1
        val seg = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
        var k = 0
        // zero-length segments (repeated consecutive vertices) are
        // skipped on BOTH sides: they add no geometry (their point is
        // covered by the adjacent segments' touch handling), and a
        // zero-length a-segment would satisfy the collinearity test for
        // every b-segment with param() dividing by zero — emitting a
        // bogus overlap at a point not on b at all
        while (k < m - 1 && (dx != 0.0 || dy != 0.0)) {
          val qx = b(2 * k); val qy = b(2 * k + 1)
          val ex = b(2 * k + 2) - qx; val ey = b(2 * k + 3) - qy
          val denom = dx * ey - dy * ex
          val wx = qx - x1; val wy = qy - y1
          if (ex == 0.0 && ey == 0.0) {
            () // zero-length b-segment: covered by its neighbors
          } else if (denom == 0.0) {
            if (wx * dy - wy * dx == 0.0) {
              // collinear: overlap interval in this a-segment's params
              def param(px: Double, py: Double): Double =
                if (Math.abs(dx) >= Math.abs(dy)) (px - x1) / dx else (py - y1) / dy
              val t1 = param(qx, qy); val t2 = param(qx + ex, qy + ey)
              val lo = Math.max(0.0, Math.min(t1, t2))
              val hi = Math.min(1.0, Math.max(t1, t2))
              if (lo < hi)
                segs += ((x1 + lo * dx, y1 + lo * dy, x1 + hi * dx, y1 + hi * dy))
              else if (lo == hi) // end-to-end collinear contact: a point
                seg += ((lo, x1 + lo * dx, y1 + lo * dy))
            }
          } else {
            val t = (wx * ey - wy * ex) / denom
            val u = (wx * dy - wy * dx) / denom
            if (t > 0.0 && t < 1.0 && u > 0.0 && u < 1.0)
              seg += ((t, x1 + t * dx, y1 + t * dy))
            else if (t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0) {
              // touch contact: the toucher's EXACT vertex coordinates
              val (px, py) =
                if (t == 0.0) (x1, y1)
                else if (t == 1.0) (x1 + dx, y1 + dy)
                else if (u == 0.0) (qx, qy)
                else (qx + ex, qy + ey)
              seg += ((t, px, py))
            }
          }
          k += 1
        }
        pts ++= seg.sortBy(_._1).map(s => (s._2, s._3))
        i += 1
      }
      // dedup touch points repeated by adjacent segments, and absorb
      // points lying on an emitted overlap run
      def onSeg(p: (Double, Double), s: (Double, Double, Double, Double)): Boolean = {
        val (px, py) = p
        val cross = (s._3 - s._1) * (py - s._2) - (s._4 - s._2) * (px - s._1)
        cross == 0.0 &&
          px >= Math.min(s._1, s._3) && px <= Math.max(s._1, s._3) &&
          py >= Math.min(s._2, s._4) && py <= Math.max(s._2, s._4)
      }
      val outPts = pts.distinct.filterNot(p => segs.exists(onSeg(p, _)))
      if (outPts.isEmpty && segs.isEmpty) return null
      def pointJson(sb: java.lang.StringBuilder): Unit =
        if (outPts.length == 1)
          sb.append("{\"type\":\"Point\",\"coordinates\":[")
            .append(outPts(0)._1).append(',').append(outPts(0)._2).append("]}")
        else {
          sb.append("{\"type\":\"MultiPoint\",\"coordinates\":[")
          for (j <- outPts.indices) {
            if (j > 0) sb.append(',')
            sb.append('[').append(outPts(j)._1).append(',').append(outPts(j)._2).append(']')
          }
          sb.append("]}")
        }
      def lineJson(sb: java.lang.StringBuilder): Unit =
        if (segs.length == 1)
          sb.append("{\"type\":\"LineString\",\"coordinates\":[[")
            .append(segs(0)._1).append(',').append(segs(0)._2).append("],[")
            .append(segs(0)._3).append(',').append(segs(0)._4).append("]]}")
        else {
          sb.append("{\"type\":\"MultiLineString\",\"coordinates\":[")
          for (j <- segs.indices) {
            if (j > 0) sb.append(',')
            sb.append("[[").append(segs(j)._1).append(',').append(segs(j)._2).append("],[")
              .append(segs(j)._3).append(',').append(segs(j)._4).append("]]")
          }
          sb.append("]}")
        }
      val sb = new java.lang.StringBuilder(64)
      if (segs.isEmpty) pointJson(sb)
      else if (outPts.isEmpty) lineJson(sb)
      else {
        sb.append("{\"type\":\"GeometryCollection\",\"geometries\":[")
        lineJson(sb); sb.append(',')
        pointJson(sb)
        sb.append("]}")
      }
      UTF8String.fromString(sb.toString)
    } catch {
      case _: Degenerate => null
      case scala.util.control.NonFatal(_) => null
    }
  }
}

case class GeoIntersection2Polygons(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("geo_intersection_2polygons", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("geo_intersection_2polygons", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoBoolOps.intersection(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.GeoBoolOps.intersection($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersection2Polygons =
    copy(left = l, right = r)
}

case class GeoUnion2Polygons(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("geo_union_2polygons", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("geo_union_2polygons", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoBoolOps.union(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.GeoBoolOps.union($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoUnion2Polygons =
    copy(left = l, right = r)
}

case class GeoUnionPolygonsArray(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val strs = Array.tabulate(in.numElements()) { i =>
      if (in.isNullAt(i)) return null else in.getUTF8String(i).toString
    }
    GeoBoolOps.unionArray(strs)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[GeoUnionPolygonsArray].getName
    val ref = ctx.addReferenceObj("unionPolys", this, cls)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(c: Expression): GeoUnionPolygonsArray =
    copy(child = c)
}

case class GeoIntersectionLineWithPolygon(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("geo_intersection_line_with_polygon", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("geo_intersection_line_with_polygon", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoBoolOps.lineClip(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.GeoBoolOps.lineClip($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersectionLineWithPolygon =
    copy(left = l, right = r)
}

case class GeoIntersection2Lines(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("geo_intersection_2lines", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("geo_intersection_2lines", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoBoolOps.lineIntersect(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.GeoBoolOps.lineIntersect($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersection2Lines =
    copy(left = l, right = r)
}
