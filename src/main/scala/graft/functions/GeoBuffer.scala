package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_line_buffer` / `geo_polygon_buffer` — offset-curve buffers
  * (offset segments + circular-arc joins + round end caps), the
  * standard buffer construction.
  *
  * Frame: a LOCAL equirectangular plane about the shape's bbox center
  * (x = R·Δlon·cos lat₀, y = R·Δlat) — the documented planar subset
  * (consistent with the geo ring's planar even-odd stance), exact on
  * the equator. QUANTIFIED bound (round 18): a boundary point at
  * latitude lat carries east-west metric error |cos lat − cos lat₀| /
  * cos lat₀ ≈ tan|lat₀|·Δφ per unit distance, so the emitted boundary
  * sits within  err ≤ r · tan|lat₀| · Δφ,  Δφ = (shape half-lat-span +
  * r/R) radians, of the true geodesic r-contour (plus the arc
  * tolerance) — e.g. ≤ 2.8 km for r = 100 km at lat 60°, ≤ 0.4 km for
  * r = 25 km there; gated at lat 60° by GeoBufferLatitudeSpec. Arcs
  * are polygonized with the SAME chord–sagitta rule as geo_point_buffer
  * (N = ⌈π / acos(1 − tol/r)⌉ per half-turn), so each polygonized arc
  * deviates from the true circle by ≤ tolerance (inscribed, so the
  * polygon under-covers by at most tolerance near arcs).
  *
  * Join rule at each vertex: a corner turning AWAY from the offset side
  * connects with an arc around the vertex; a corner turning INTO the
  * offset side trims both offset segments at their line intersection —
  * when the trim point falls outside either segment, or two trims on
  * one segment cross (turn too sharp for the radius), the result is
  * loudly null. The assembled ring is scanned for self-intersection (a
  * radius large enough to make the offset curve non-simple) — loudly
  * null, never a silently-wrong shape.
  *
  * geo_polygon_buffer expands the outer ring outward and shrinks the
  * holes; a hole whose shrunken ring inverts or collapses (the buffer
  * swallows it) is dropped — points within `radius` of the hole
  * boundary ARE in the buffer; a partially self-intersecting shrunk
  * hole is null.
  *
  * Pinned guards (the geo family's loudly-null stance): radius ∈
  * (0, 10^6] m, tolerance > 0, shape within lat ±85 / lon ±179.9 after
  * expansion, ≥ 2 distinct vertices (line) / ≥ 3 (rings). Reference
  * surface: the connector emits no geo KQL — north-star scope
  * (it/KustoSinkIT.java:269-271).
  */
object GeoBufferOps {
  private val R = 6371009.0

  private final class Degenerate extends RuntimeException

  // ---------- planar offset machinery (meters frame) ----------

  /** Arc points around center (cx,cy) from angle a1 sweeping `sweep`
    * radians (signed), EXCLUSIVE of both endpoints. */
  private def arcPoints(out: scala.collection.mutable.ArrayBuffer[Double],
                        cx: Double, cy: Double, r: Double,
                        a1: Double, sweep: Double, stepRad: Double): Unit = {
    val steps = math.max(1, math.ceil(math.abs(sweep) / stepRad).toInt)
    var k = 1
    while (k < steps) {
      val a = a1 + sweep * k / steps
      out += cx + r * math.cos(a); out += cy + r * math.sin(a)
      k += 1
    }
  }

  /** One side's offset of a chain of segments.
    *
    * `pts` is the open vertex list (flat xy meters), segments i: v_i →
    * v_{i+1}; `side` +1 offsets left of travel, −1 right; `closed`
    * wraps the joint at vertex 0. Appends the offset boundary points to
    * `out` in travel order. Throws Degenerate on reversal spikes,
    * invalid trims, or crossed trims. */
  private def offsetChain(pts: Array[Double], side: Double, r: Double,
                          stepRad: Double, closed: Boolean,
                          out: scala.collection.mutable.ArrayBuffer[Double]): Unit = {
    val n = pts.length / 2
    val m = if (closed) n else n - 1 // segment count
    val dx = new Array[Double](m); val dy = new Array[Double](m)
    val len = new Array[Double](m)
    var i = 0
    while (i < m) {
      val j = (i + 1) % n
      val l = math.hypot(pts(2 * j) - pts(2 * i), pts(2 * j + 1) - pts(2 * i + 1))
      if (l == 0.0) throw new Degenerate
      dx(i) = (pts(2 * j) - pts(2 * i)) / l; dy(i) = (pts(2 * j + 1) - pts(2 * i + 1)) / l
      len(i) = l
      i += 1
    }
    // side normal of segment i: left = (-dy, dx), right = (dy, -dx)
    def nx(i: Int): Double = -side * dy(i)
    def ny(i: Int): Double = side * dx(i)
    // joint k sits at the END of segment k (vertex (k+1) % n); joints
    // exist for k in 0..m-2, plus k = m-1 when closed (wrapping to seg 0)
    val joints = if (closed) m else m - 1
    // per-joint: 0 = straight, 1 = arc, 2 = trim
    val kind = new Array[Int](joints)
    val trimX = new Array[Double](joints); val trimY = new Array[Double](joints)
    val trimT = new Array[Double](joints) // distance BACK from seg k's offset end
    val trimU = new Array[Double](joints) // distance FORWARD from seg k+1's offset start
    var k = 0
    while (k < joints) {
      val a = k; val b = (k + 1) % m
      val cross = dx(a) * dy(b) - dy(a) * dx(b)
      val dot = dx(a) * dx(b) + dy(a) * dy(b)
      if (cross == 0.0) {
        if (dot < 0) throw new Degenerate // reversal spike
        kind(k) = 0
      } else if (cross * side < 0) {
        kind(k) = 1 // diverging: arc
      } else {
        kind(k) = 2 // converging: trim
        val vIdx = (k + 1) % n
        val vx = pts(2 * vIdx); val vy = pts(2 * vIdx + 1)
        // offset end of seg a: E = v + r·n_a; offset start of seg b: S = v + r·n_b
        val ex = vx + r * nx(a); val ey = vy + r * ny(a)
        val sx = vx + r * nx(b); val sy = vy + r * ny(b)
        // X = E + t·d_a = S + u·d_b
        val denom = dx(a) * dy(b) - dy(a) * dx(b)
        val t = ((sx - ex) * dy(b) - (sy - ey) * dx(b)) / denom
        val u = ((sx - ex) * dy(a) - (sy - ey) * dx(a)) / denom
        if (!(t <= 0.0 && -t <= len(a) && u >= 0.0 && u <= len(b))) throw new Degenerate
        trimX(k) = ex + t * dx(a); trimY(k) = ey + t * dy(a)
        trimT(k) = -t; trimU(k) = u
      }
      k += 1
    }
    // crossed-trims check: both ends of a segment trimmed past each other
    i = 0
    while (i < m) {
      val jPrev = if (closed) (i + joints - 1) % joints else i - 1
      val jNext = if (i < joints) i else -1
      if (jPrev >= 0 && jNext >= 0 && (if (closed) true else jPrev >= 0) &&
          kind.lift(jPrev).contains(2) && kind.lift(jNext).contains(2)) {
        if (trimU(jPrev) + trimT(jNext) > len(i)) throw new Degenerate
      }
      i += 1
    }
    // assemble: for each segment emit effective start (unless the prior
    // joint was a trim, whose point covers it), then effective end or
    // trim point; arcs insert their points between segments.
    i = 0
    var skipStart = false
    // for a closed chain, the wrap joint (joints-1) may be a trim that
    // covers segment 0's start: handle by checking it up front
    if (closed && kind(joints - 1) == 2) skipStart = true
    while (i < m) {
      val s0x = pts(2 * i) + r * nx(i); val s0y = pts(2 * i + 1) + r * ny(i)
      if (!skipStart) { out += s0x; out += s0y }
      skipStart = false
      val j = if (i < joints) i else -1
      val vIdx = (i + 1) % n
      val vx = pts(2 * vIdx); val vy = pts(2 * vIdx + 1)
      if (j < 0) {
        // open chain's last segment: plain offset end (cap added by caller)
        out += vx + r * nx(i); out += vy + r * ny(i)
      } else kind(j) match {
        case 0 =>
          out += vx + r * nx(i); out += vy + r * ny(i)
          skipStart = true // same point as next segment's start
        case 1 =>
          out += vx + r * nx(i); out += vy + r * ny(i)
          val angA = math.atan2(ny(i), nx(i))
          val b = (i + 1) % m
          val angB = math.atan2(ny(b), nx(b))
          var sweep = angB - angA
          while (sweep > math.Pi) sweep -= 2 * math.Pi
          while (sweep < -math.Pi) sweep += 2 * math.Pi
          arcPoints(out, vx, vy, r, angA, sweep, stepRad)
        case 2 =>
          if (!(closed && j == joints - 1)) {
            out += trimX(j); out += trimY(j)
            skipStart = true
          }
          // wrap trim on a closed ring: its point was already emitted as
          // segment 0's (skipped) start replacement — emit it now at the
          // ring's end only if segment 0's start was skipped up front;
          // since we skipped seg 0's start, emit the trim point here.
          else { out += trimX(j); out += trimY(j) }
      }
      i += 1
    }
  }

  /** Pinned output-size cap: a tolerance fine enough to polygonize past
    * this many vertices would make the O(V²) self-intersection guard the
    * per-row hot loop — loudly null instead (raise the tolerance). */
  private[functions] val MaxRingVertices = 4096

  /** Any strict crossing between non-adjacent edges of the closed ring
    * (open form)? */
  private def ringSelfIntersects(ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    var i = 0
    while (i < n) {
      val i2 = (i + 1) % n
      val ax = ring(2 * i); val ay = ring(2 * i + 1)
      val bx = ring(2 * i2); val by = ring(2 * i2 + 1)
      var j = i + 2
      while (j < n) {
        val j2 = (j + 1) % n
        if (j2 != i) {
          val cx = ring(2 * j); val cy = ring(2 * j + 1)
          val ddx = ring(2 * j2); val ddy = ring(2 * j2 + 1)
          val d1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
          val d2 = (bx - ax) * (ddy - ay) - (by - ay) * (ddx - ax)
          val d3 = (ddx - cx) * (ay - cy) - (ddy - cy) * (ax - cx)
          val d4 = (ddx - cx) * (by - cy) - (ddy - cy) * (bx - cx)
          if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
              ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
        }
        j += 1
      }
      i += 1
    }
    false
  }

  private def signedArea2(ring: Array[Double]): Double = {
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

  // ---------- projection + entry points ----------

  private def stepRadFor(r: Double, tol: Double): Double = {
    val tt = math.min(tol, r)
    math.Pi / math.max(4, math.min(16384,
      math.ceil(math.Pi / math.acos(1.0 - tt / r)).toInt)).toDouble
  }

  /** bbox-center frame; null if the expanded shape leaves the pinned
    * validity window. Returns (lon0, lat0, cos lat0). */
  private def frame(flat: Array[Double], radiusM: Double): (Double, Double, Double) = {
    var minLon = Double.MaxValue; var maxLon = -Double.MaxValue
    var minLat = Double.MaxValue; var maxLat = -Double.MaxValue
    var i = 0
    while (i < flat.length / 2) {
      val lo = flat(2 * i); val la = flat(2 * i + 1)
      if (lo < -180 || lo > 180 || la < -90 || la > 90) return null
      minLon = math.min(minLon, lo); maxLon = math.max(maxLon, lo)
      minLat = math.min(minLat, la); maxLat = math.max(maxLat, la)
      i += 1
    }
    val rDeg = math.toDegrees(radiusM / R)
    if (math.max(math.abs(minLat), math.abs(maxLat)) + rDeg > 85.0) return null
    val lat0 = (minLat + maxLat) / 2
    val kk = math.cos(math.toRadians(lat0))
    if (math.max(math.abs(minLon), math.abs(maxLon)) + rDeg / kk > 179.9) return null
    ((minLon + maxLon) / 2, lat0, kk)
  }

  private def project(flat: Array[Double], lon0: Double, lat0: Double, kk: Double): Array[Double] = {
    val m = new Array[Double](flat.length)
    var i = 0
    while (i < flat.length / 2) {
      m(2 * i) = R * math.toRadians(flat(2 * i) - lon0) * kk
      m(2 * i + 1) = R * math.toRadians(flat(2 * i + 1) - lat0)
      i += 1
    }
    m
  }

  private def emitRingLonLat(sb: java.lang.StringBuilder, ringM: Array[Double],
                             lon0: Double, lat0: Double, kk: Double): Unit = {
    val n = ringM.length / 2
    sb.append('[')
    var i = 0
    while (i <= n) {
      val j = i % n
      if (i > 0) sb.append(',')
      val lon = lon0 + math.toDegrees(ringM(2 * j) / (R * kk))
      val lat = lat0 + math.toDegrees(ringM(2 * j + 1) / R)
      sb.append('[').append(lon).append(',').append(lat).append(']')
      i += 1
    }
    sb.append(']')
  }

  /** line buffer: capsule-style offset outline of an open polyline. */
  def lineBuffer(json: UTF8String, radiusM: Double, tolM: Double): UTF8String = {
    if (!(radiusM > 0.0) || radiusM > 1.0e6 || !(tolM > 0.0)) return null
    val raw = GeoPredOps.parseLine(json.toString)
    if (raw == null) return null
    // dedup consecutive duplicates
    val pts0 = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < raw.length / 2) {
      if (pts0.length < 2 || raw(2 * i) != pts0(pts0.length - 2) ||
          raw(2 * i + 1) != pts0(pts0.length - 1)) {
        pts0 += raw(2 * i); pts0 += raw(2 * i + 1)
      }
      i += 1
    }
    if (pts0.length < 4) return null
    try {
      val flat = pts0.toArray
      val fr = frame(flat, radiusM)
      if (fr == null) return null
      val (lon0, lat0, kk) = fr
      val stepRad = stepRadFor(radiusM, tolM)
      val m = project(flat, lon0, lat0, kk)
      val n = m.length / 2
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      // left side forward
      offsetChain(m, side = 1.0, radiusM, stepRad, closed = false, out)
      // end cap: half-turn around the last vertex from the left normal
      locally {
        val dl = math.hypot(m(2 * n - 2) - m(2 * n - 4), m(2 * n - 1) - m(2 * n - 3))
        val ddx = (m(2 * n - 2) - m(2 * n - 4)) / dl
        val ddy = (m(2 * n - 1) - m(2 * n - 3)) / dl
        arcPoints(out, m(2 * n - 2), m(2 * n - 1), radiusM,
          math.atan2(ddx, -ddy), -math.Pi, stepRad)
      }
      // right side = left side of the reversed polyline
      val rev = new Array[Double](m.length)
      i = 0
      while (i < n) {
        rev(2 * i) = m(2 * (n - 1 - i)); rev(2 * i + 1) = m(2 * (n - 1 - i) + 1)
        i += 1
      }
      offsetChain(rev, side = 1.0, radiusM, stepRad, closed = false, out)
      // start cap
      locally {
        val dl = math.hypot(rev(2 * n - 2) - rev(2 * n - 4), rev(2 * n - 1) - rev(2 * n - 3))
        val ddx = (rev(2 * n - 2) - rev(2 * n - 4)) / dl
        val ddy = (rev(2 * n - 1) - rev(2 * n - 3)) / dl
        arcPoints(out, rev(2 * n - 2), rev(2 * n - 1), radiusM,
          math.atan2(ddx, -ddy), -math.Pi, stepRad)
      }
      val ring0 = out.toArray
      if (ring0.length / 2 > MaxRingVertices) return null
      if (ringSelfIntersects(ring0)) return null
      // the walk traverses the boundary CLOCKWISE; reverse for CCW
      val rn = ring0.length / 2
      val ccw = new Array[Double](ring0.length)
      i = 0
      while (i < rn) {
        ccw(2 * i) = ring0(2 * (rn - 1 - i)); ccw(2 * i + 1) = ring0(2 * (rn - 1 - i) + 1)
        i += 1
      }
      if (signedArea2(ccw) <= 0) return null
      val sb = new java.lang.StringBuilder(128)
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      emitRingLonLat(sb, ccw, lon0, lat0, kk)
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch {
      case _: Degenerate => null
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** polygon buffer: outward expansion of the outer ring; holes shrink
    * (vanishing holes drop; a partially-inverting hole is null). */
  def polygonBuffer(json: UTF8String, radiusM: Double, tolM: Double): UTF8String = {
    if (!(radiusM > 0.0) || radiusM > 1.0e6 || !(tolM > 0.0)) return null
    val rings0 = GeoBoolOps.parseSide(json.toString) // outer CCW, holes CW, open
    if (rings0 == null) return null
    try {
      val fr = frame(rings0(0), radiusM)
      if (fr == null) return null
      val (lon0, lat0, kk) = fr
      val stepRad = stepRadFor(radiusM, tolM)
      // offset RIGHT of travel: outward for the CCW outer ring, into the
      // hole (shrinking it) for CW holes
      def offsetRing(r: Array[Double]): Array[Double] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Double]
        offsetChain(project(r, lon0, lat0, kk), side = -1.0, radiusM, stepRad,
          closed = true, out)
        out.toArray
      }
      // structural degeneracy of a closed ring — a zero-length edge or a
      // reversal spike. These are malformed-INPUT conditions (independent
      // of the radius): the geo family's stance is loudly-null, same as
      // the outer ring. Only radius-driven trim failures during the
      // offset below mean "hole vanished".
      def structurallyBad(lonLat: Array[Double]): Boolean = {
        val pm = project(lonLat, lon0, lat0, kk)
        val n = pm.length / 2
        val dxs = new Array[Double](n); val dys = new Array[Double](n)
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val l = math.hypot(pm(2 * j) - pm(2 * i), pm(2 * j + 1) - pm(2 * i + 1))
          if (l == 0.0) return true // duplicate consecutive vertex
          dxs(i) = (pm(2 * j) - pm(2 * i)) / l
          dys(i) = (pm(2 * j + 1) - pm(2 * i + 1)) / l
          i += 1
        }
        var k = 0
        while (k < n) {
          val b = (k + 1) % n
          val cross = dxs(k) * dys(b) - dys(k) * dxs(b)
          val dot = dxs(k) * dxs(b) + dys(k) * dys(b)
          if (cross == 0.0 && dot < 0) return true // reversal spike
          k += 1
        }
        false
      }
      val outM = offsetRing(rings0(0))
      if (outM.length < 6 || outM.length / 2 > MaxRingVertices) return null
      if (ringSelfIntersects(outM)) return null
      if (signedArea2(outM) <= 0) return null
      val holesM = rings0.drop(1).flatMap { h =>
        if (structurallyBad(h)) throw new Degenerate // malformed hole: null
        val hm = try Some(offsetRing(h)) catch { case _: Degenerate => None }
        hm match {
          case None => None // trim impossible: hole smaller than 2r — vanished
          case Some(x) if x.length < 6 => None
          case Some(x) if signedArea2(x) >= 0 => None // inverted: vanished
          case Some(x) if ringSelfIntersects(x) => throw new Degenerate
          case Some(x) => Some(x)
        }
      }
      val sb = new java.lang.StringBuilder(128)
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      emitRingLonLat(sb, outM, lon0, lat0, kk)
      for (h <- holesM) { sb.append(','); emitRingLonLat(sb, h, lon0, lat0, kk) }
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch {
      case _: Degenerate => null
      case scala.util.control.NonFatal(_) => null
    }
  }
}

case class GeoLineBuffer(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_line_buffer", first)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoBufferOps.lineBuffer(a.asInstanceOf[UTF8String],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.GeoBufferOps.lineBuffer($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoLineBuffer =
    copy(first = a, second = b, third = c)
}

case class GeoPolygonBuffer(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_polygon_buffer", first)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoBufferOps.polygonBuffer(a.asInstanceOf[UTF8String],
      b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.GeoBufferOps.polygonBuffer($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoPolygonBuffer =
    copy(first = a, second = b, third = c)
}
