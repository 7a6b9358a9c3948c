package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the hot geo scalars — the intersect predicates,
  * the closest-point pair, and the point-to-shape distances.
  *
  * These were previously lowered to higher-order-function Column trees
  * (`aggregate`/`zip_with` folds over the parsed coordinate arrays).
  * Spark's HOF lambdas are CodegenFallback — every row walks an
  * interpreted expression tree, and the pair-cross predicates nest two
  * folds (O(n·m) interpreted closures per row). At spatial-join scale
  * that interpretation overhead dominates the actual math by >10×.
  * Each scalar is now ONE codegen'd static call: parse the GeoJSON once
  * (Jackson, thread-local mapper — the GeoBoolOps pattern), run the
  * same IEEE op-order math in a tight double loop, return.
  *
  * EXACTNESS CONTRACT: the spherical kernels mirror the retired Column
  * lowering term by term — `ang` keeps `pow(sin(·),2)` (not `sin·sin`),
  * `radians(x)/2` (not `radians(x/2)`), the `d12==0 → dat<=0 → dat>=d12`
  * case ladder, and the `[-1,1]` clamps — because the q227/q233/q235
  * DuckDB oracles restate precisely that op order (the q147/q220
  * bit-stability stance) and the KqlCompilerSpec pins exact equalities
  * (endpoint clamp ≡ geo_distance_2points; foot distance ≡
  * geo_distance_point_to_line). Keep kernel and oracle in sync.
  *
  * Planar stance unchanged: the intersect predicates and the even-odd
  * inside test run in planar lon/lat (they agree with
  * geo_point_in_polygon about membership/boundaries); touching counts
  * as intersecting; distances are great-circle on the IUGG sphere.
  * Malformed shapes / wrong `type` / non-numeric coordinates /
  * out-of-range query points → null (the geo family's loudly-null
  * stance).
  */
object GeoPredOps {
  private val R = 6371009.0

  private val mappers = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Parse a GeoJSON LineString to a flat [lon0,lat0,lon1,lat1,…] array;
    * null unless type==LineString with ≥2 numeric positions. */
  def parseLine(json: String): Array[Double] = {
    try {
      val root = mappers.get().readTree(json)
      if (root == null || root.get("type") == null ||
          !"LineString".equals(root.get("type").asText())) return null
      val cs = root.get("coordinates")
      if (cs == null || !cs.isArray || cs.size() < 2) return null
      val out = new Array[Double](2 * cs.size())
      var i = 0
      while (i < cs.size()) {
        val p = cs.get(i)
        if (p == null || !p.isArray || p.size() < 2 ||
            !p.get(0).isNumber || !p.get(1).isNumber) return null
        // + 0.0 folds -0.0 to +0.0 so boxed-tuple dedup in the line
        // boolean ops (GeoBool) sees one representation; numerically a
        // no-op for every other consumer
        out(2 * i) = p.get(0).asDouble() + 0.0
        out(2 * i + 1) = p.get(1).asDouble() + 0.0
        i += 1
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Parse a GeoJSON Polygon to flat per-ring arrays; null unless
    * type==Polygon with ≥1 ring of numeric positions (ring size is NOT
    * floored — degenerate rings contribute zero crossings/segments,
    * matching the retired Column lowering). */
  def parsePoly(json: String): Array[Array[Double]] = {
    try {
      val root = mappers.get().readTree(json)
      if (root == null || root.get("type") == null ||
          !"Polygon".equals(root.get("type").asText())) return null
      val cs = root.get("coordinates")
      if (cs == null || !cs.isArray || cs.size() < 1) return null
      val out = new Array[Array[Double]](cs.size())
      var r = 0
      while (r < cs.size()) {
        val ring = cs.get(r)
        if (ring == null || !ring.isArray) return null
        val flat = new Array[Double](2 * ring.size())
        var i = 0
        while (i < ring.size()) {
          val p = ring.get(i)
          if (p == null || !p.isArray || p.size() < 2 ||
              !p.get(0).isNumber || !p.get(1).isNumber) return null
          flat(2 * i) = p.get(0).asDouble(); flat(2 * i + 1) = p.get(1).asDouble()
          i += 1
        }
        out(r) = flat
        r += 1
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def inRange(px: Double, py: Double): Boolean =
    px >= -180.0 && px <= 180.0 && py >= -90.0 && py <= 90.0

  // ---- spherical kernels (EXACT op-order mirrors of the oracle) ----

  /** Haversine central angle — `2·asin(sqrt(pow(sin(Δlat/2),2) + …))`
    * with `pow`, mirroring the oracle's restatement verbatim. */
  private def ang(aLon: Double, aLat: Double, bLon: Double, bLat: Double): Double =
    2.0 * Math.asin(Math.sqrt(
      Math.pow(Math.sin(Math.toRadians(bLat - aLat) / 2), 2) +
        Math.cos(Math.toRadians(aLat)) * Math.cos(Math.toRadians(bLat)) *
          Math.pow(Math.sin(Math.toRadians(bLon - aLon) / 2), 2)))

  private def brg(aLon: Double, aLat: Double, bLon: Double, bLat: Double): Double =
    Math.atan2(
      Math.sin(Math.toRadians(bLon - aLon)) * Math.cos(Math.toRadians(bLat)),
      Math.cos(Math.toRadians(aLat)) * Math.sin(Math.toRadians(bLat)) -
        Math.sin(Math.toRadians(aLat)) * Math.cos(Math.toRadians(bLat)) *
          Math.cos(Math.toRadians(bLon - aLon)))

  private def clamp1(v: Double): Double = Math.max(-1.0, Math.min(1.0, v))

  /** Great-circle point-to-segment distance in meters (segDistM). */
  def segDist(pLon: Double, pLat: Double, lon1: Double, lat1: Double,
              lon2: Double, lat2: Double): Double = {
    val d13 = ang(lon1, lat1, pLon, pLat)
    val d12 = ang(lon1, lat1, lon2, lat2)
    if (d12 == 0.0) return d13 * R
    val t13 = brg(lon1, lat1, pLon, pLat)
    val t12 = brg(lon1, lat1, lon2, lat2)
    val dxt = Math.asin(clamp1(Math.sin(d13) * Math.sin(t13 - t12)))
    val dat = Math.acos(clamp1(Math.cos(d13) / Math.cos(dxt))) *
      Math.signum(Math.cos(t13 - t12))
    if (dat <= 0.0) d13 * R
    else if (dat >= d12) ang(lon2, lat2, pLon, pLat) * R
    else Math.abs(dxt) * R
  }

  /** Point-to-segment CLOSEST point: same case ladder as [[segDist]];
    * writes (d, lon, lat) into `out`. Interior case = spherical
    * destination from the segment start along its initial bearing. */
  private def segClosest(pLon: Double, pLat: Double, lon1: Double, lat1: Double,
                         lon2: Double, lat2: Double, out: Array[Double]): Unit = {
    val d13 = ang(lon1, lat1, pLon, pLat)
    val d12 = ang(lon1, lat1, lon2, lat2)
    if (d12 == 0.0) { out(0) = d13 * R; out(1) = lon1; out(2) = lat1; return }
    val t13 = brg(lon1, lat1, pLon, pLat)
    val t12 = brg(lon1, lat1, lon2, lat2)
    val dxt = Math.asin(clamp1(Math.sin(d13) * Math.sin(t13 - t12)))
    val dat = Math.acos(clamp1(Math.cos(d13) / Math.cos(dxt))) *
      Math.signum(Math.cos(t13 - t12))
    if (dat <= 0.0) { out(0) = d13 * R; out(1) = lon1; out(2) = lat1 }
    else if (dat >= d12) {
      out(0) = ang(lon2, lat2, pLon, pLat) * R; out(1) = lon2; out(2) = lat2
    } else {
      val sinLat1 = Math.sin(Math.toRadians(lat1))
      val cosLat1 = Math.cos(Math.toRadians(lat1))
      val latF = Math.asin(clamp1(
        sinLat1 * Math.cos(dat) + cosLat1 * Math.sin(dat) * Math.cos(t12)))
      val lonF = Math.toRadians(lon1) +
        Math.atan2(Math.sin(t12) * Math.sin(dat) * cosLat1,
          Math.cos(dat) - sinLat1 * Math.sin(latF))
      out(0) = Math.abs(dxt) * R
      out(1) = Math.toDegrees(lonF); out(2) = Math.toDegrees(latF)
    }
  }

  // ---- planar kernels (the even-odd family stance) ----

  /** Even-odd crossings of the ray from (px,py) with one ring's CLOSED
    * traversal (segment (i, (i+1) mod n) — the closure duplicate of an
    * already-closed ring is a zero-length no-op). */
  private def ringCrossings(ring: Array[Double], px: Double, py: Double): Long = {
    val n = ring.length / 2
    var c = 0L
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
      if (((y1 > py) != (y2 > py)) &&
          (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)) c += 1
      i += 1
    }
    c
  }

  /** Even-odd inside test over ALL rings (point-in-polygon rule). */
  def evenOddInside(rings: Array[Array[Double]], px: Double, py: Double): Boolean = {
    var c = 0L
    var r = 0
    while (r < rings.length) { c += ringCrossings(rings(r), px, py); r += 1 }
    (c & 1L) == 1L
  }

  private def orient(px: Double, py: Double, qx: Double, qy: Double,
                     rx: Double, ry: Double): Double =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  private def onSeg(px: Double, py: Double, qx: Double, qy: Double,
                    rx: Double, ry: Double): Boolean =
    orient(px, py, qx, qy, rx, ry) == 0.0 &&
      rx >= Math.min(px, qx) && rx <= Math.max(px, qx) &&
      ry >= Math.min(py, qy) && ry <= Math.max(py, qy)

  /** Proper crossing via the four orientation signs; collinear/endpoint
    * touching counts (shapes sharing any common point intersect). */
  private def segPairCross(ax: Double, ay: Double, bx: Double, by: Double,
                           cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    ((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
      ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0)) ||
      onSeg(ax, ay, bx, by, cx, cy) || onSeg(ax, ay, bx, by, dx, dy) ||
      onSeg(cx, cy, dx, dy, ax, ay) || onSeg(cx, cy, dx, dy, bx, by)
  }

  /** Any line segment (OPEN traversal) crossing any CLOSED-traversal
    * segment of any polygon ring. */
  private def lineCrossesPoly(line: Array[Double], rings: Array[Array[Double]]): Boolean = {
    val n = line.length / 2
    var i = 0
    while (i < n - 1) {
      val ax = line(2 * i); val ay = line(2 * i + 1)
      val bx = line(2 * i + 2); val by = line(2 * i + 3)
      var r = 0
      while (r < rings.length) {
        val ring = rings(r)
        val m = ring.length / 2
        var k = 0
        while (k < m) {
          val l = (k + 1) % m
          if (segPairCross(ax, ay, bx, by,
              ring(2 * k), ring(2 * k + 1), ring(2 * l), ring(2 * l + 1))) return true
          k += 1
        }
        r += 1
      }
      i += 1
    }
    false
  }

  // ---- the exported scalars ----

  def distPointToLine(px: Double, py: Double, lineJson: UTF8String): java.lang.Double = {
    if (!inRange(px, py)) return null
    val line = parseLine(lineJson.toString)
    if (line == null) return null
    var best = Double.MaxValue
    val n = line.length / 2
    var i = 0
    while (i < n - 1) {
      val d = segDist(px, py, line(2 * i), line(2 * i + 1),
        line(2 * i + 2), line(2 * i + 3))
      if (d < best) best = d
      i += 1
    }
    java.lang.Double.valueOf(best)
  }

  def distPointToPolygon(px: Double, py: Double, polyJson: UTF8String): java.lang.Double = {
    if (!inRange(px, py)) return null
    val rings = parsePoly(polyJson.toString)
    if (rings == null) return null
    if (evenOddInside(rings, px, py)) return java.lang.Double.valueOf(0.0)
    var best = Double.MaxValue
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val d = segDist(px, py, ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1))
        if (d < best) best = d
        i += 1
      }
      r += 1
    }
    java.lang.Double.valueOf(best)
  }

  private def pointJson(x: Double, y: Double): UTF8String = {
    val sb = new java.lang.StringBuilder(48)
    sb.append("{\"type\":\"Point\",\"coordinates\":[")
      .append(x).append(',').append(y).append("]}")
    UTF8String.fromString(sb.toString)
  }

  def closestPointOnLine(px: Double, py: Double, lineJson: UTF8String): UTF8String = {
    if (!inRange(px, py)) return null
    val line = parseLine(lineJson.toString)
    if (line == null) return null
    val cur = new Array[Double](3)
    var bestD = Double.MaxValue; var bestX = 0.0; var bestY = 0.0
    val n = line.length / 2
    var i = 0
    while (i < n - 1) { // first strict minimum wins
      segClosest(px, py, line(2 * i), line(2 * i + 1),
        line(2 * i + 2), line(2 * i + 3), cur)
      if (cur(0) < bestD) { bestD = cur(0); bestX = cur(1); bestY = cur(2) }
      i += 1
    }
    pointJson(bestX, bestY)
  }

  def closestPointOnPolygon(px: Double, py: Double, polyJson: UTF8String): UTF8String = {
    if (!inRange(px, py)) return null
    val rings = parsePoly(polyJson.toString)
    if (rings == null) return null
    if (evenOddInside(rings, px, py)) return pointJson(px, py)
    val cur = new Array[Double](3)
    var bestD = Double.MaxValue; var bestX = 0.0; var bestY = 0.0
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) { // closed traversal, first strict minimum wins
        val j = (i + 1) % n
        segClosest(px, py, ring(2 * i), ring(2 * i + 1),
          ring(2 * j), ring(2 * j + 1), cur)
        if (cur(0) < bestD) { bestD = cur(0); bestX = cur(1); bestY = cur(2) }
        i += 1
      }
      r += 1
    }
    pointJson(bestX, bestY)
  }

  /** Polygon OR MultiPolygon (Kusto accepts both) to per-component
    * ring groups; null on anything else. The Polygon form is one
    * component — existing callers flatten. */
  def parsePolyStruct(json: String): Array[Array[Array[Double]]] = {
    try {
      val root = mappers.get().readTree(json)
      if (root == null || root.get("type") == null) return null
      val t = root.get("type").asText()
      if ("Polygon".equals(t)) {
        val one = parsePoly(json)
        if (one == null) null else Array(one)
      } else if ("MultiPolygon".equals(t)) {
        val cs = root.get("coordinates")
        if (cs == null || !cs.isArray || cs.size() < 1) return null
        val out = new Array[Array[Array[Double]]](cs.size())
        var c = 0
        while (c < cs.size()) {
          val poly = cs.get(c)
          if (poly == null || !poly.isArray || poly.size() < 1) return null
          val rings = new Array[Array[Double]](poly.size())
          var r = 0
          while (r < poly.size()) {
            val ring = poly.get(r)
            if (ring == null || !ring.isArray) return null
            val flat = new Array[Double](2 * ring.size())
            var i = 0
            while (i < ring.size()) {
              val p = ring.get(i)
              if (p == null || !p.isArray || p.size() < 2 ||
                  !p.get(0).isNumber || !p.get(1).isNumber) return null
              flat(2 * i) = p.get(0).asDouble(); flat(2 * i + 1) = p.get(1).asDouble()
              i += 1
            }
            rings(r) = flat
            r += 1
          }
          out(c) = rings
          c += 1
        }
        out
      } else null
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Even-odd membership. NOTE: no lon/lat range guard — the scalar's
    * pinned contract (geo_point_in_polygon) tests any finite point.
    * Accepts Polygon or MultiPolygon (even-odd parity over all rings of
    * all components — components are disjoint, so the flat sum is the
    * per-component test). */
  def pointInPolygon(px: Double, py: Double, polyJson: UTF8String): java.lang.Boolean = {
    val comps = parsePolyStruct(polyJson.toString)
    if (comps == null) return null
    java.lang.Boolean.valueOf(evenOddInside(comps.flatten, px, py))
  }

  def intersects2Lines(aJson: UTF8String, bJson: UTF8String): java.lang.Boolean = {
    val a = parseLine(aJson.toString); if (a == null) return null
    val b = parseLine(bJson.toString); if (b == null) return null
    val n = a.length / 2; val m = b.length / 2
    var i = 0
    while (i < n - 1) {
      var k = 0
      while (k < m - 1) {
        if (segPairCross(a(2 * i), a(2 * i + 1), a(2 * i + 2), a(2 * i + 3),
            b(2 * k), b(2 * k + 1), b(2 * k + 2), b(2 * k + 3)))
          return java.lang.Boolean.TRUE
        k += 1
      }
      i += 1
    }
    java.lang.Boolean.FALSE
  }

  def intersectsLineWithPolygon(lJson: UTF8String, pJson: UTF8String): java.lang.Boolean = {
    val line = parseLine(lJson.toString); if (line == null) return null
    val rings = parsePoly(pJson.toString); if (rings == null) return null
    val n = line.length / 2
    var i = 0
    while (i < n) { // any line vertex inside (containment w/o crossing)
      if (evenOddInside(rings, line(2 * i), line(2 * i + 1)))
        return java.lang.Boolean.TRUE
      i += 1
    }
    java.lang.Boolean.valueOf(lineCrossesPoly(line, rings))
  }

  // ---- ring-2 shape scalars (length / perimeter / area / centroids) ----

  /** The `(2R)·asin(√a)` haversine form the ring-2 scalars lower to —
    * note the DIFFERENT constant factoring from [[ang]] (`2·asin(·)`
    * then `·R`): the q220 oracle restates THIS form; keep both. */
  private def havM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dlat = Math.toRadians(lat2 - lat1) / 2
    val dlon = Math.toRadians(lon2 - lon1) / 2
    val a = Math.pow(Math.sin(dlat), 2) +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        Math.pow(Math.sin(dlon), 2)
    (2.0 * 6371009.0) * Math.asin(Math.sqrt(a))
  }

  def lineLength(json: UTF8String): java.lang.Double = {
    val one = parseLine(json.toString)
    val chains: Array[Array[Double]] =
      if (one != null) Array(one)
      else {
        // MultiLineString (the Kusto surface accepts both)
        try {
          val root = mappers.get().readTree(json.toString)
          if (root == null || root.get("type") == null ||
              !"MultiLineString".equals(root.get("type").asText())) return null
          val cs = root.get("coordinates")
          if (cs == null || !cs.isArray || cs.size() < 1) return null
          val out = new Array[Array[Double]](cs.size())
          var c = 0
          while (c < cs.size()) {
            val ch = cs.get(c)
            if (ch == null || !ch.isArray || ch.size() < 2) return null
            val flat = new Array[Double](2 * ch.size())
            var i = 0
            while (i < ch.size()) {
              val p = ch.get(i)
              if (p == null || !p.isArray || p.size() < 2 ||
                  !p.get(0).isNumber || !p.get(1).isNumber) return null
              flat(2 * i) = p.get(0).asDouble(); flat(2 * i + 1) = p.get(1).asDouble()
              i += 1
            }
            out(c) = flat
            c += 1
          }
          out
        } catch { case scala.util.control.NonFatal(_) => return null }
      }
    var s = 0.0
    var c = 0
    while (c < chains.length) {
      val line = chains(c)
      val n = line.length / 2
      var i = 0
      while (i < n - 1) {
        s += havM(line(2 * i), line(2 * i + 1), line(2 * i + 2), line(2 * i + 3))
        i += 1
      }
      c += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Closed-traversal ring length (the closure duplicate of an
    * already-closed ring is a zero-length no-op). */
  private def ringLenM(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += havM(ring(2 * i), ring(2 * i + 1), ring(2 * j), ring(2 * j + 1))
      i += 1
    }
    s
  }

  def polygonPerimeter(json: UTF8String): java.lang.Double = {
    val rings = parsePoly(json.toString)
    if (rings == null) return null
    var s = 0.0
    var r = 0
    while (r < rings.length) {
      if (rings(r).length >= 2) s += ringLenM(rings(r))
      r += 1
    }
    java.lang.Double.valueOf(s)
  }

  private val GeoR2Half = 20294877839040.5 // 6371009^2 / 2

  /** |ring| under the Chamberlain–Duquette spherical-excess term sum,
    * closed traversal, left-to-right fold order (the q220 oracle
    * restates it term by term). */
  private def ringAreaAbs(ring: Array[Double]): Double = {
    val n = ring.length / 2
    var s = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += Math.toRadians(ring(2 * j) - ring(2 * i)) *
        (2.0 + Math.sin(Math.toRadians(ring(2 * i + 1))) +
          Math.sin(Math.toRadians(ring(2 * j + 1))))
      i += 1
    }
    Math.abs(s) * GeoR2Half
  }

  /** exterior − holes = 2·|ring₀| − Σ|ringᵢ| per component, summed over
    * components (accepts Polygon or MultiPolygon, the Kusto surface). */
  def polygonArea(json: UTF8String): java.lang.Double = {
    val comps = parsePolyStruct(json.toString)
    if (comps == null) return null
    var total = 0.0
    var c = 0
    while (c < comps.length) {
      val rings = comps(c)
      if (rings(0).length < 2) return null
      var sum = 0.0
      var r = 0
      while (r < rings.length) {
        if (rings(r).length >= 2) sum += ringAreaAbs(rings(r))
        r += 1
      }
      total += 2.0 * ringAreaAbs(rings(0)) - sum
      c += 1
    }
    java.lang.Double.valueOf(total)
  }

  /** Segment-LENGTH-weighted average of segment midpoints (planar
    * lon/lat midpoints — the documented no-antimeridian subset); zero
    * total length (degenerate line) → the first vertex. */
  def lineCentroid(json: UTF8String): UTF8String = {
    val line = parseLine(json.toString)
    if (line == null) return null
    var w = 0.0; var x = 0.0; var y = 0.0
    val n = line.length / 2
    var i = 0
    while (i < n - 1) {
      val wi = havM(line(2 * i), line(2 * i + 1), line(2 * i + 2), line(2 * i + 3))
      w += wi
      x += wi * ((line(2 * i) + line(2 * i + 2)) / 2)
      y += wi * ((line(2 * i + 1) + line(2 * i + 3)) / 2)
      i += 1
    }
    if (w > 0) pointJson(x / w, y / w) else pointJson(line(0), line(1))
  }

  /** Planar shoelace centroid over lon/lat, SIGNED ring sums so
    * GeoJSON-oriented holes (CW vs the CCW exterior) subtract
    * naturally; Cx = Σ(xᵢ+xᵢ₊₁)·crossᵢ / (3·Σcross). Rings below 3
    * vertices contribute nothing; zero signed area → null. */
  def polygonCentroid(json: UTF8String): UTF8String = {
    val rings = parsePoly(json.toString)
    if (rings == null) return null
    var s = 0.0; var x = 0.0; var y = 0.0
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      if (n >= 3) {
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          val cr = ring(2 * i) * ring(2 * j + 1) - ring(2 * j) * ring(2 * i + 1)
          s += cr
          x += (ring(2 * i) + ring(2 * j)) * cr
          y += (ring(2 * i + 1) + ring(2 * j + 1)) * cr
          i += 1
        }
      }
      r += 1
    }
    if (s == 0.0) return null
    pointJson(x / (3.0 * s), y / (3.0 * s))
  }

  def intersects2Polygons(aJson: UTF8String, bJson: UTF8String): java.lang.Boolean = {
    val ra = parsePoly(aJson.toString); if (ra == null) return null
    val rb = parsePoly(bJson.toString); if (rb == null) return null
    var r = 0
    while (r < ra.length) { // any vertex of A inside B, or of B inside A
      val ring = ra(r); val n = ring.length / 2
      var i = 0
      while (i < n) {
        if (evenOddInside(rb, ring(2 * i), ring(2 * i + 1)))
          return java.lang.Boolean.TRUE
        i += 1
      }
      r += 1
    }
    r = 0
    while (r < rb.length) {
      val ring = rb(r); val n = ring.length / 2
      var i = 0
      while (i < n) {
        if (evenOddInside(ra, ring(2 * i), ring(2 * i + 1)))
          return java.lang.Boolean.TRUE
        i += 1
      }
      r += 1
    }
    // any CLOSED-traversal edge pair crossing
    r = 0
    while (r < ra.length) {
      val ring = ra(r); val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = (i + 1) % n
        val ax = ring(2 * i); val ay = ring(2 * i + 1)
        val bx = ring(2 * j); val by = ring(2 * j + 1)
        var s = 0
        while (s < rb.length) {
          val rg = rb(s); val m = rg.length / 2
          var k = 0
          while (k < m) {
            val l = (k + 1) % m
            if (segPairCross(ax, ay, bx, by,
                rg(2 * k), rg(2 * k + 1), rg(2 * l), rg(2 * l + 1)))
              return java.lang.Boolean.TRUE
            k += 1
          }
          s += 1
        }
        i += 1
      }
      r += 1
    }
    java.lang.Boolean.FALSE
  }
}

private[functions] object GeoPredGuards {
  def ddsGuard(fn: String, a: Expression, b: Expression, c: Expression): TypeCheckResult = {
    def dbl(e: Expression, pos: String): TypeCheckResult = e.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires DOUBLE for its $pos argument, got ${other.catalogString}")
    }
    val l = dbl(a, "first")
    if (l != TypeCheckResult.TypeCheckSuccess) return l
    val m = dbl(b, "second")
    if (m != TypeCheckResult.TypeCheckSuccess) return m
    TypeGuards.requireString(fn, c)
  }
}

/** Base for the (lon, lat, shapeJson) → T scalars. */
abstract class GeoPointShapeExpr extends TernaryExpression {
  def fnName: String
  override def checkInputDataTypes(): TypeCheckResult =
    GeoPredGuards.ddsGuard(fnName, first, second, third)
  override def nullable: Boolean = true
}

case class GeoDistancePointToLine(first: Expression, second: Expression, third: Expression)
  extends GeoPointShapeExpr {
  override def fnName: String = "geo_distance_point_to_line"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val r = GeoPredOps.distPointToLine(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val t = ctx.freshName("gd")
      s"""
      java.lang.Double $t = graft.functions.GeoPredOps.distPointToLine($a, $b, $c);
      ${ev.isNull} = $t == null;
      if (!${ev.isNull}) ${ev.value} = $t.doubleValue();"""
    })
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoDistancePointToLine =
    copy(first = a, second = b, third = c)
}

case class GeoDistancePointToPolygon(first: Expression, second: Expression, third: Expression)
  extends GeoPointShapeExpr {
  override def fnName: String = "geo_distance_point_to_polygon"
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val r = GeoPredOps.distPointToPolygon(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val t = ctx.freshName("gd")
      s"""
      java.lang.Double $t = graft.functions.GeoPredOps.distPointToPolygon($a, $b, $c);
      ${ev.isNull} = $t == null;
      if (!${ev.isNull}) ${ev.value} = $t.doubleValue();"""
    })
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoDistancePointToPolygon =
    copy(first = a, second = b, third = c)
}

case class GeoClosestPointOnLine(first: Expression, second: Expression, third: Expression)
  extends GeoPointShapeExpr {
  override def fnName: String = "geo_closest_point_on_line"
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoPredOps.closestPointOnLine(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.GeoPredOps.closestPointOnLine($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoClosestPointOnLine =
    copy(first = a, second = b, third = c)
}

case class GeoClosestPointOnPolygon(first: Expression, second: Expression, third: Expression)
  extends GeoPointShapeExpr {
  override def fnName: String = "geo_closest_point_on_polygon"
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    GeoPredOps.closestPointOnPolygon(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.GeoPredOps.closestPointOnPolygon($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoClosestPointOnPolygon =
    copy(first = a, second = b, third = c)
}

/** Base for the (shapeJson, shapeJson) → BOOLEAN intersect predicates. */
abstract class GeoIntersectsExpr extends BinaryExpression {
  def fnName: String
  def opsCall: String
  def evalCall(a: UTF8String, b: UTF8String): java.lang.Boolean
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString(fnName, left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString(fnName, right)
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = evalCall(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.freshName("gi")
      s"""
      java.lang.Boolean $t = graft.functions.GeoPredOps.$opsCall($a, $b);
      ${ev.isNull} = $t == null;
      if (!${ev.isNull}) ${ev.value} = $t.booleanValue();"""
    })
}

/** (shapeJson) → DOUBLE: line_length | polygon_perimeter | polygon_area. */
case class GeoShapeScalar(child: Expression, op: String)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString(s"geo_$op", child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  private def call(s: UTF8String): java.lang.Double = op match {
    case "line_length" => GeoPredOps.lineLength(s)
    case "polygon_perimeter" => GeoPredOps.polygonPerimeter(s)
    case "polygon_area" => GeoPredOps.polygonArea(s)
  }
  override protected def nullSafeEval(a: Any): Any = {
    val r = call(a.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = op match {
      case "line_length" => "lineLength"
      case "polygon_perimeter" => "polygonPerimeter"
      case "polygon_area" => "polygonArea"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("gs")
      s"""
      java.lang.Double $t = graft.functions.GeoPredOps.$fn($a);
      ${ev.isNull} = $t == null;
      if (!${ev.isNull}) ${ev.value} = $t.doubleValue();"""
    })
  }
  override protected def withNewChildInternal(c: Expression): GeoShapeScalar =
    copy(child = c)
}

/** (shapeJson) → GeoJSON Point: the length-weighted line centroid or
  * the signed-shoelace polygon centroid. */
case class GeoShapeCentroid(child: Expression, line: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString(
      if (line) "geo_line_centroid" else "geo_polygon_centroid", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    if (line) GeoPredOps.lineCentroid(a.asInstanceOf[UTF8String])
    else GeoPredOps.polygonCentroid(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (line) "lineCentroid" else "polygonCentroid"
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.GeoPredOps.$fn($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(c: Expression): GeoShapeCentroid =
    copy(child = c)
}

case class GeoPointInPolygon(first: Expression, second: Expression, third: Expression)
  extends GeoPointShapeExpr {
  override def fnName: String = "geo_point_in_polygon"
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val r = GeoPredOps.pointInPolygon(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[UTF8String])
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val t = ctx.freshName("gp")
      s"""
      java.lang.Boolean $t = graft.functions.GeoPredOps.pointInPolygon($a, $b, $c);
      ${ev.isNull} = $t == null;
      if (!${ev.isNull}) ${ev.value} = $t.booleanValue();"""
    })
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): GeoPointInPolygon =
    copy(first = a, second = b, third = c)
}

case class GeoIntersects2Lines(left: Expression, right: Expression)
  extends GeoIntersectsExpr {
  override def fnName: String = "geo_intersects_2lines"
  override def opsCall: String = "intersects2Lines"
  override def evalCall(a: UTF8String, b: UTF8String): java.lang.Boolean =
    GeoPredOps.intersects2Lines(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersects2Lines =
    copy(left = l, right = r)
}

case class GeoIntersectsLineWithPolygon(left: Expression, right: Expression)
  extends GeoIntersectsExpr {
  override def fnName: String = "geo_intersects_line_with_polygon"
  override def opsCall: String = "intersectsLineWithPolygon"
  override def evalCall(a: UTF8String, b: UTF8String): java.lang.Boolean =
    GeoPredOps.intersectsLineWithPolygon(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersectsLineWithPolygon =
    copy(left = l, right = r)
}

case class GeoIntersects2Polygons(left: Expression, right: Expression)
  extends GeoIntersectsExpr {
  override def fnName: String = "geo_intersects_2polygons"
  override def opsCall: String = "intersects2Polygons"
  override def evalCall(a: UTF8String, b: UTF8String): java.lang.Boolean =
    GeoPredOps.intersects2Polygons(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersects2Polygons =
    copy(left = l, right = r)
}
