package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_intersection_2polygons` — the CONVEX-CLIP documented subset.
  *
  * Full polygon boolean construction needs a clipping engine
  * (Greiner–Hormann class) whose degenerate-case behavior is not
  * publishable as a clean pinned spec; the subset shipped here is the
  * textbook-exact case that covers the dominant use (clipping to a
  * viewport / bounding region): the SECOND polygon must be CONVEX and
  * hole-free (loudly null otherwise — never a silently-wrong shape),
  * the first may be any simple polygon with holes. Each subject ring is
  * clipped independently with Sutherland–Hodgman (half-plane folds over
  * the clip edges, planar lon/lat — the geo ring's even-odd stance);
  * ring∩convex-window is exact for convex-vs-convex and even-odd-exact
  * in general (a concave subject may emit zero-area seam edges — the
  * documented SH behavior; area and membership are unaffected).
  *
  * Pinned rules: boundary points count as inside (cross ≥ 0); clip ring
  * normalized to CCW by signed area; output rings keep subject
  * orientation, are closed verbatim, and drop below 3 distinct
  * vertices; an empty intersection (or a clipped-away exterior ring)
  * is null — the loudly-null stance.
  */
object GeoClipOps {
  private val mappers = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  private def parsePoly(json: String): Array[Array[Double]] = {
    val root = mappers.get().readTree(json)
    if (root == null || root.get("type") == null ||
        !"Polygon".equals(root.get("type").asText())) return null
    val cs = root.get("coordinates")
    if (cs == null || !cs.isArray || cs.size() == 0) return null
    val out = new Array[Array[Double]](cs.size())
    var r = 0
    while (r < cs.size()) {
      val ring = cs.get(r)
      if (!ring.isArray || ring.size() < 3) return null
      val flat = new Array[Double](2 * ring.size())
      var a = 0
      while (a < ring.size()) {
        val pt = ring.get(a)
        if (!pt.isArray || pt.size() < 2) return null
        flat(2 * a) = pt.get(0).asDouble(); flat(2 * a + 1) = pt.get(1).asDouble()
        a += 1
      }
      out(r) = flat
      r += 1
    }
    out
  }

  /** Strip the GeoJSON closure vertex when present. */
  private def open(ring: Array[Double]): Array[Double] = {
    val n = ring.length / 2
    if (n >= 2 && ring(0) == ring(2 * n - 2) && ring(1) == ring(2 * n - 1))
      ring.take(2 * n - 2)
    else ring
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

  private def isConvex(ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    if (n < 3) return false
    var pos = false; var neg = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cr = (ring(2 * j) - ring(2 * i)) * (ring(2 * k + 1) - ring(2 * j + 1)) -
        (ring(2 * j + 1) - ring(2 * i + 1)) * (ring(2 * k) - ring(2 * j))
      if (cr > 0) pos = true else if (cr < 0) neg = true
      i += 1
    }
    !(pos && neg)
  }

  /** One Sutherland–Hodgman half-plane pass: keep points with
    * cross(b−a, p−a) ≥ 0 (left of the CCW clip edge, boundary kept). */
  private def clipEdge(pts: Array[Double], ax: Double, ay: Double,
                       bx: Double, by: Double): Array[Double] = {
    val n = pts.length / 2
    if (n == 0) return pts
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    def side(px: Double, py: Double): Double =
      (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    var i = 0
    while (i < n) {
      val cx = pts(2 * i); val cy = pts(2 * i + 1)
      val pj = (i + n - 1) % n
      val px = pts(2 * pj); val py = pts(2 * pj + 1)
      val sc = side(cx, cy); val sp = side(px, py)
      def emitIntersection(): Unit = {
        val t = sp / (sp - sc) // sp and sc straddle zero here
        out += px + t * (cx - px); out += py + t * (cy - py)
      }
      if (sc >= 0) {
        if (sp < 0) emitIntersection()
        out += cx; out += cy
      } else if (sp >= 0) emitIntersection()
      i += 1
    }
    out.toArray
  }

  private def distinctCount(pts: Array[Double]): Int = {
    val n = pts.length / 2
    val seen = scala.collection.mutable.Set.empty[(Double, Double)]
    var i = 0
    while (i < n) { seen += ((pts(2 * i), pts(2 * i + 1))); i += 1 }
    seen.size
  }

  def intersection(subjJson: UTF8String, clipJson: UTF8String): UTF8String = {
    try {
      val subj = parsePoly(subjJson.toString)
      val clip = parsePoly(clipJson.toString)
      if (subj == null || clip == null) return null
      if (clip.length != 1) return null // clip must be hole-free
      var w = open(clip(0))
      if (!isConvex(w)) return null
      if (signedArea2(w) < 0) { // normalize CCW
        val n = w.length / 2
        val rev = new Array[Double](w.length)
        var i = 0
        while (i < n) {
          rev(2 * i) = w(2 * (n - 1 - i)); rev(2 * i + 1) = w(2 * (n - 1 - i) + 1)
          i += 1
        }
        w = rev
      }
      val wn = w.length / 2
      val rings = subj.iterator.map { ring0 =>
        var pts = open(ring0)
        var e = 0
        while (e < wn && pts.nonEmpty) {
          val j = (e + 1) % wn
          pts = clipEdge(pts, w(2 * e), w(2 * e + 1), w(2 * j), w(2 * j + 1))
          e += 1
        }
        pts
      }.toArray
      if (rings.isEmpty || distinctCount(rings(0)) < 3) return null
      val sb = new java.lang.StringBuilder(64)
      sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
      var emitted = 0
      var r = 0
      while (r < rings.length) {
        val pts = rings(r)
        if (distinctCount(pts) >= 3) {
          if (emitted > 0) sb.append(',')
          sb.append('[')
          val n = pts.length / 2
          var i = 0
          while (i < n) {
            if (i > 0) sb.append(',')
            sb.append('[').append(pts(2 * i)).append(',').append(pts(2 * i + 1)).append(']')
            i += 1
          }
          // close verbatim
          sb.append(",[").append(pts(0)).append(',').append(pts(1)).append(']')
          sb.append(']')
          emitted += 1
        }
        r += 1
      }
      sb.append("]}")
      UTF8String.fromString(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => null }
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
    GeoClipOps.intersection(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.GeoClipOps.intersection($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoIntersection2Polygons =
    copy(left = l, right = r)
}
