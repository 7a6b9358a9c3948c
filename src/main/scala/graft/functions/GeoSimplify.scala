package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_line_simplify(line, tolerance_m)` / `geo_polygon_simplify(
  * polygon, tolerance_m)` — Douglas–Peucker with great-circle
  * point-to-segment distances on the IUGG sphere (the SAME formulas the
  * compiler's geo_distance_point_to_line lowers to, so simplify and
  * distance agree about what "within tolerance" means).
  *
  * Pinned semantics:
  *  - lines keep their endpoints; a fully-collinear-within-tolerance
  *    line collapses to its two endpoints;
  *  - polygon rings simplify CLOSED (first == last preserved); a ring
  *    that would drop below 4 points (triangle + closure) keeps its
  *    4 most recent survivors — Kusto also refuses to destroy rings;
  *  - malformed shapes, non-positive tolerance → null (the loudly-null
  *    geo family stance).
  *
  * Iterative DP with an explicit stack (no recursion depth limit);
  * per-row cost O(n log n) typical — map-side, no shuffle. */
object GeoSimplifyOps {
  private val R = 6371009.0

  private def angDist(aLon: Double, aLat: Double, bLon: Double, bLat: Double): Double = {
    val dLat = math.toRadians(bLat - aLat) / 2
    val dLon = math.toRadians(bLon - aLon) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(aLat)) * math.cos(math.toRadians(bLat)) *
        math.sin(dLon) * math.sin(dLon)
    2.0 * math.asin(math.sqrt(a))
  }

  private def bearing(aLon: Double, aLat: Double, bLon: Double, bLat: Double): Double = {
    val dl = math.toRadians(bLon - aLon)
    math.atan2(
      math.sin(dl) * math.cos(math.toRadians(bLat)),
      math.cos(math.toRadians(aLat)) * math.sin(math.toRadians(bLat)) -
        math.sin(math.toRadians(aLat)) * math.cos(math.toRadians(bLat)) * math.cos(dl))
  }

  /** Great-circle point-to-segment distance in meters (segDistM's math). */
  private def segDist(pLon: Double, pLat: Double, aLon: Double, aLat: Double,
                      bLon: Double, bLat: Double): Double = {
    val d13 = angDist(aLon, aLat, pLon, pLat)
    val d12 = angDist(aLon, aLat, bLon, bLat)
    if (d12 == 0.0) return d13 * R
    val t13 = bearing(aLon, aLat, pLon, pLat)
    val t12 = bearing(aLon, aLat, bLon, bLat)
    val sinXt = math.max(-1.0, math.min(1.0, math.sin(d13) * math.sin(t13 - t12)))
    val dxt = math.asin(sinXt)
    val dat = math.acos(math.max(-1.0, math.min(1.0, math.cos(d13) / math.cos(dxt)))) *
      math.signum(math.cos(t13 - t12))
    if (dat <= 0.0) d13 * R
    else if (dat >= d12) angDist(bLon, bLat, pLon, pLat) * R
    else math.abs(dxt) * R
  }

  /** Douglas–Peucker keep-mask over an OPEN point sequence. */
  private[functions] def dpKeep(xs: Array[Double], ys: Array[Double], tolM: Double): Array[Boolean] = {
    val n = xs.length
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.Stack((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo > 1) {
        var best = -1
        var bestD = -1.0
        var i = lo + 1
        while (i < hi) {
          val d = segDist(xs(i), ys(i), xs(lo), ys(lo), xs(hi), ys(hi))
          if (d > bestD) { bestD = d; best = i }
          i += 1
        }
        if (bestD > tolM) {
          keep(best) = true
          stack.push((lo, best)); stack.push((best, hi))
        }
      }
    }
    keep
  }

  private val mappers = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  private def fmtPts(sb: java.lang.StringBuilder, xs: Array[Double], ys: Array[Double],
                     keep: Array[Boolean]): Unit = {
    var first = true
    var i = 0
    while (i < xs.length) {
      if (keep(i)) {
        if (!first) sb.append(',')
        first = false
        sb.append('[').append(xs(i)).append(',').append(ys(i)).append(']')
      }
      i += 1
    }
  }

  private def parseRing(node: com.fasterxml.jackson.databind.JsonNode):
      Option[(Array[Double], Array[Double])] = {
    if (node == null || !node.isArray || node.size() < 2) return None
    val xs = new Array[Double](node.size())
    val ys = new Array[Double](node.size())
    var i = 0
    while (i < node.size()) {
      val p = node.get(i)
      if (p == null || !p.isArray || p.size() < 2) return None
      xs(i) = p.get(0).asDouble(); ys(i) = p.get(1).asDouble()
      i += 1
    }
    Some((xs, ys))
  }

  def simplifyLine(json: UTF8String, tolM: Double): UTF8String = {
    if (!(tolM > 0)) return null
    try {
      val root = mappers.get().readTree(json.toString)
      if (root == null || root.get("type") == null ||
          !"LineString".equals(root.get("type").asText())) return null
      val (xs, ys) = parseRing(root.get("coordinates")).getOrElse(return null)
      val keep = dpKeep(xs, ys, tolM)
      val sb = new java.lang.StringBuilder(64)
      sb.append("{\"type\":\"LineString\",\"coordinates\":[")
      fmtPts(sb, xs, ys, keep)
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => null }
  }

  /** Spherical midpoint of the geodesic a→b (degrees in/out). */
  private def geodesicMid(aLon: Double, aLat: Double,
                          bLon: Double, bLat: Double): (Double, Double) = {
    val la1 = math.toRadians(aLat); val la2 = math.toRadians(bLat)
    val dLon = math.toRadians(bLon - aLon)
    val bx = math.cos(la2) * math.cos(dLon)
    val by = math.cos(la2) * math.sin(dLon)
    val latm = math.atan2(math.sin(la1) + math.sin(la2),
      math.sqrt((math.cos(la1) + bx) * (math.cos(la1) + bx) + by * by))
    val lonm = math.toRadians(aLon) + math.atan2(by, math.cos(la1) + bx)
    (math.toDegrees(lonm), math.toDegrees(latm))
  }

  /** Densify the planar edge a→b: if the midpoint deviation (great-circle
    * distance from the PLANAR midpoint to the GEODESIC midpoint) exceeds
    * the tolerance, split at the planar midpoint and recurse — every
    * added point is an exact planar bisection, so the output chain stays
    * collinear with the input edge in lon/lat. Emits (a..b], a excluded.
    * Depth cap 16 (deviation shrinks ~4× per split; 16 levels turn a
    * half-circumference edge into sub-millimeter parts). */
  private def densifyEdge(ax: Double, ay: Double, bx: Double, by: Double,
      tolM: Double, depth: Int,
      out: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Unit = {
    val mx = (ax + bx) / 2; val my = (ay + by) / 2
    val (gx, gy) = geodesicMid(ax, ay, bx, by)
    if (depth >= 16 || angDist(mx, my, gx, gy) * R <= tolM) out += ((bx, by))
    else {
      densifyEdge(ax, ay, mx, my, tolM, depth + 1, out)
      densifyEdge(mx, my, bx, by, tolM, depth + 1, out)
    }
  }

  private def densifyPts(xs: Array[Double], ys: Array[Double],
      tolM: Double): scala.collection.mutable.ArrayBuffer[(Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]((xs(0), ys(0)))
    var i = 0
    while (i < xs.length - 1) {
      densifyEdge(xs(i), ys(i), xs(i + 1), ys(i + 1), tolM, 0, out)
      i += 1
    }
    out
  }

  private def fmtChain(sb: java.lang.StringBuilder,
      pts: scala.collection.mutable.ArrayBuffer[(Double, Double)]): Unit = {
    var i = 0
    while (i < pts.length) {
      if (i > 0) sb.append(',')
      sb.append('[').append(pts(i)._1).append(',').append(pts(i)._2).append(']')
      i += 1
    }
  }

  /** geo_point_buffer(lon, lat, radius_m, tolerance_m): the circle
    * polygon around a point — a regular spherical N-gon whose vertices
    * sit EXACTLY at great-circle distance `radius` (destination
    * formula), counterclockwise per GeoJSON, ring closed by repeating
    * vertex 0 verbatim. N = clamp(⌈π / acos(1 − tol/radius)⌉, 4, 16384)
    * — the chord-sagitta bound, so the polygon's edge deviates from the
    * true circle by at most `tolerance` meters. Pinned documented
    * subset: null when radius ∉ (0, 10^7] m, tolerance ≤ 0, the point
    * is out of range, or the circle reaches past lat ±85 / lon ±179.9
    * (the geo ring's no-pole/no-antimeridian stance — planar even-odd
    * tests stay valid on the result). */
  def pointBuffer(lon: Double, lat: Double, radiusM: Double, tolM: Double): UTF8String = {
    if (!(radiusM > 0.0) || radiusM > 1.0e7 || !(tolM > 0.0)) return null
    if (lon < -180 || lon > 180 || lat < -90 || lat > 90) return null
    val rDeg = math.toDegrees(radiusM / R)
    val maxAbsLat = math.abs(lat) + rDeg
    if (maxAbsLat > 85.0) return null
    if (math.abs(lon) + rDeg / math.cos(math.toRadians(maxAbsLat)) > 179.9) return null
    val tt = math.min(tolM, radiusM)
    val n = math.max(4, math.min(16384,
      math.ceil(math.Pi / math.acos(1.0 - tt / radiusM)).toInt))
    val d = radiusM / R
    val sinLat = math.sin(math.toRadians(lat)); val cosLat = math.cos(math.toRadians(lat))
    val cosD = math.cos(d); val sinD = math.sin(d)
    def vertex(k: Int): String = {
      val theta = -2.0 * math.Pi * k / n // CCW on the map
      val la = math.asin(sinLat * cosD + cosLat * sinD * math.cos(theta))
      val lo = math.toRadians(lon) +
        math.atan2(math.sin(theta) * sinD * cosLat, cosD - sinLat * math.sin(la))
      "[" + math.toDegrees(lo) + "," + math.toDegrees(la) + "]"
    }
    val first = vertex(0)
    val sb = new java.lang.StringBuilder(32 + 44 * (n + 1))
    sb.append("{\"type\":\"Polygon\",\"coordinates\":[[").append(first)
    var k = 1
    while (k < n) { sb.append(',').append(vertex(k)); k += 1 }
    sb.append(',').append(first).append("]]}")
    UTF8String.fromString(sb.toString)
  }

  /** geo_line_densify(line, tolerance_m): converts planar edges to
    * geodesic chains — Kusto's documented contract; tolerance must be in
    * [0.1, 5000] (Kusto's range), out-of-range / malformed → null. The
    * pinned subdivision rule (Kusto's internals unspecified): recursive
    * planar bisection until each part's midpoint deviation ≤ tolerance. */
  def densifyLine(json: UTF8String, tolM: Double): UTF8String = {
    if (!(tolM >= 0.1 && tolM <= 5000.0)) return null
    try {
      val root = mappers.get().readTree(json.toString)
      if (root == null || root.get("type") == null ||
          !"LineString".equals(root.get("type").asText())) return null
      val (xs, ys) = parseRing(root.get("coordinates")).getOrElse(return null)
      val sb = new java.lang.StringBuilder(64)
      sb.append("{\"type\":\"LineString\",\"coordinates\":[")
      fmtChain(sb, densifyPts(xs, ys, tolM))
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => null }
  }

  /** geo_polygon_densify(polygon, tolerance_m): every ring's stored
    * vertex sequence densified edge-by-edge (the GeoJSON closure vertex
    * is part of the sequence, so closure is preserved verbatim). */
  def densifyPolygon(json: UTF8String, tolM: Double): UTF8String = {
    if (!(tolM >= 0.1 && tolM <= 5000.0)) return null
    try {
      val root = mappers.get().readTree(json.toString)
      if (root == null || root.get("type") == null ||
          !"Polygon".equals(root.get("type").asText())) return null
      val rings = root.get("coordinates")
      if (rings == null || !rings.isArray || rings.size() < 1) return null
      val sb = new java.lang.StringBuilder(64)
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      var r = 0
      while (r < rings.size()) {
        val (xs, ys) = parseRing(rings.get(r)).getOrElse(return null)
        if (xs.length < 4) return null
        if (r > 0) sb.append(',')
        sb.append('[')
        fmtChain(sb, densifyPts(xs, ys, tolM))
        sb.append(']')
        r += 1
      }
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => null }
  }

  def simplifyPolygon(json: UTF8String, tolM: Double): UTF8String = {
    if (!(tolM > 0)) return null
    try {
      val root = mappers.get().readTree(json.toString)
      if (root == null || root.get("type") == null ||
          !"Polygon".equals(root.get("type").asText())) return null
      val rings = root.get("coordinates")
      if (rings == null || !rings.isArray || rings.size() < 1) return null
      val sb = new java.lang.StringBuilder(64)
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      var r = 0
      while (r < rings.size()) {
        val (xs, ys) = parseRing(rings.get(r)).getOrElse(return null)
        if (xs.length < 4) return null // closed ring needs triangle + closure
        val keep = dpKeep(xs, ys, tolM)
        // ring floor: keep at least 4 points (closure included) — walk
        // dropped points back in, nearest-to-start first, determinism
        var kept = keep.count(identity)
        var i = 1
        while (kept < 4 && i < xs.length - 1) {
          if (!keep(i)) { keep(i) = true; kept += 1 }
          i += 1
        }
        if (r > 0) sb.append(',')
        sb.append('[')
        fmtPts(sb, xs, ys, keep)
        sb.append(']')
        r += 1
      }
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => null }
  }
}

abstract class GeoSimplifyExpr extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  protected def fnName: String
  protected def evalFn: (UTF8String, Double) => UTF8String
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fnName requires (string, double), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any, t: Any): Any =
    evalFn(s.asInstanceOf[UTF8String], t.asInstanceOf[Double])
}

/** geo_line_simplify(line, tolerance_m). */
case class GeoLineSimplify(left: Expression, right: Expression) extends GeoSimplifyExpr {
  override protected def fnName = "geo_line_simplify"
  override protected def evalFn = GeoSimplifyOps.simplifyLine
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) => s"""
      ${ev.value} = graft.functions.GeoSimplifyOps.simplifyLine($s, $t);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoLineSimplify =
    copy(left = l, right = r)
}

/** geo_point_buffer(lon, lat, radius_m, tolerance_m). */
case class GeoPointBuffer(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == org.apache.spark.sql.types.DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_point_buffer requires four doubles, got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoSimplifyOps.pointBuffer(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => s"""
      ${ev.value} = graft.functions.GeoSimplifyOps.pointBuffer($a, $b, $c, $d);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): GeoPointBuffer =
    copy(first = f, second = s, third = t, fourth = q)
}

/** geo_line_densify(line, tolerance_m). */
case class GeoLineDensify(left: Expression, right: Expression) extends GeoSimplifyExpr {
  override protected def fnName = "geo_line_densify"
  override protected def evalFn = GeoSimplifyOps.densifyLine
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) => s"""
      ${ev.value} = graft.functions.GeoSimplifyOps.densifyLine($s, $t);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoLineDensify =
    copy(left = l, right = r)
}

/** geo_polygon_densify(polygon, tolerance_m). */
case class GeoPolygonDensify(left: Expression, right: Expression) extends GeoSimplifyExpr {
  override protected def fnName = "geo_polygon_densify"
  override protected def evalFn = GeoSimplifyOps.densifyPolygon
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) => s"""
      ${ev.value} = graft.functions.GeoSimplifyOps.densifyPolygon($s, $t);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoPolygonDensify =
    copy(left = l, right = r)
}

/** geo_polygon_simplify(polygon, tolerance_m). */
case class GeoPolygonSimplify(left: Expression, right: Expression) extends GeoSimplifyExpr {
  override protected def fnName = "geo_polygon_simplify"
  override protected def evalFn = GeoSimplifyOps.simplifyPolygon
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) => s"""
      ${ev.value} = graft.functions.GeoSimplifyOps.simplifyPolygon($s, $t);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoPolygonSimplify =
    copy(left = l, right = r)
}
