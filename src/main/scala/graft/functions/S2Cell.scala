package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** S2 cell-id algebra — `geo_point_to_s2cell(lon, lat, level)` and
  * `geo_s2cell_to_central_point(token)` (Kusto's geo JOIN keys; the
  * reference's query surface is KQL, so these carry its dashboards'
  * geo aggregations — see SURVEY §2.2 geo ring note).
  *
  * Implements the PUBLIC s2geometry cell scheme (s2geometry.io
  * "S2 Cells"; the `S2CellId::FromFaceIJ` / `ToFaceIJOrientation` /
  * `STtoUV` quadratic-projection algorithms are published under
  * Apache-2.0 and re-derived here from the documented math):
  *
  *  1. lon/lat → unit-sphere (x,y,z); face 0..5 = ±x/±y/±z by largest
  *     absolute component; per-face gnomonic (u,v) in [-1,1]²;
  *  2. the QUADRATIC (u,v)→(s,t) reprojection (areas equalized within
  *     2.1×) — s = √(1+3u)/2 for u ≥ 0, mirrored below;
  *  3. (s,t) → 30-bit leaf (i,j); face-local HILBERT position via the
  *     standard 4-bit lookup tables (built by the published recursive
  *     subdivision with orientation swap/invert masks);
  *  4. 64-bit id = face(3 bits) · curve position (2·level bits) ·
  *     sentinel 1 bit · zeros; parent(level) keeps the high 2·level
  *     position bits and re-plants the sentinel;
  *  5. token = 16-nibble lowercase hex, trailing zeros stripped — the
  *     interchange form every S2 binding emits.
  *
  * The Hilbert adjacency property is what makes these ids GOOD join /
  * partition keys at 100 TB: nearby points share cell prefixes, so a
  * shuffle on the level-k token co-locates spatial neighborhoods and
  * range scans touch contiguous id runs. Encode and decode are flat
  * per-row arithmetic inside whole-stage codegen (table lookups on
  * 1 KiB static arrays — no allocation but the output token).
  *
  * Pinned stances: invalid lon/lat/token → null (the loudly-null geo
  * family rule, same as the geohash pair); the center point decode is
  * the EXACT cell center (si/ti midpoint), so center re-encodes to the
  * same token at the same level — the round-trip contract the gate
  * checks; level 0 faces 0..5 tokens are the published "1"/"3"/"5"/
  * "7"/"9"/"b" vectors.
  */
object S2CellOps {
  private val MaxLevel = 30
  private val LookupBits = 4
  private val SwapMask = 1
  private val InvertMask = 2
  // published traversal tables: child order per orientation, and the
  // orientation change each child applies
  private val PosToIJ = Array(
    Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val PosToOrientation = Array(SwapMask, 0, 0, InvertMask | SwapMask)

  private val lookupPos = new Array[Int](1 << (2 * LookupBits + 2))
  private val lookupIJ = new Array[Int](1 << (2 * LookupBits + 2))
  locally {
    def go(level: Int, i: Int, j: Int, origO: Int, pos: Int, o: Int): Unit =
      if (level == LookupBits) {
        val ij = (i << LookupBits) + j
        lookupPos((ij << 2) + origO) = (pos << 2) + o
        lookupIJ((pos << 2) + origO) = (ij << 2) + o
      } else {
        val r = PosToIJ(o)
        var idx = 0
        while (idx < 4) {
          go(level + 1, (i << 1) + (r(idx) >> 1), (j << 1) + (r(idx) & 1),
            origO, (pos << 2) + idx, o ^ PosToOrientation(idx))
          idx += 1
        }
      }
    go(0, 0, 0, 0, 0, 0)
    go(0, 0, 0, SwapMask, 0, SwapMask)
    go(0, 0, 0, InvertMask, 0, InvertMask)
    go(0, 0, 0, SwapMask | InvertMask, 0, SwapMask | InvertMask)
  }

  private def fromFaceIJ(face: Int, i: Int, j: Int): Long = {
    var n: Long = face.toLong << 60
    var bits: Int = face & SwapMask
    var k = 7
    while (k >= 0) {
      val mask = (1 << LookupBits) - 1
      bits += ((i >> (k * LookupBits)) & mask) << (LookupBits + 2)
      bits += ((j >> (k * LookupBits)) & mask) << 2
      bits = lookupPos(bits)
      n |= (bits >> 2).toLong << (k * 2 * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    n * 2 + 1 // leaf id: position shifted up one, sentinel planted
  }

  private def idToToken(id: Long): String = {
    val hx = java.lang.Long.toHexString(id)
    val s = "0" * (16 - hx.length) + hx
    var e = s.length
    while (e > 1 && s.charAt(e - 1) == '0') e -= 1
    s.substring(0, e)
  }

  private def tokenToId(tok: String): Long = {
    if (tok == null || tok.isEmpty || tok.length > 16) return 0L
    var k = 0
    while (k < tok.length) {
      val c = tok.charAt(k)
      if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) return 0L
      k += 1
    }
    java.lang.Long.parseUnsignedLong(tok + "0" * (16 - tok.length), 16)
  }

  private def isValidId(id: Long): Boolean =
    (id >>> 61) <= 5 && ((id & -id) & 0x1555555555555555L) != 0

  private def faceUVtoXYZ(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case _ => (v, u, -1.0)
    }

  private def xyzToFaceUV(x: Double, y: Double, z: Double): (Int, Double, Double) = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val comp = if (axis == 0) x else if (axis == 1) y else z
    val face = if (comp < 0) axis + 3 else axis
    face match {
      case 0 => (0, y / x, z / x)
      case 1 => (1, -x / y, z / y)
      case 2 => (2, -x / z, -y / z)
      case 3 => (3, z / x, y / x)
      case 4 => (4, z / y, -x / y)
      case _ => (5, -y / z, -x / z)
    }
  }

  /** (face, leaf-i, leaf-j) of the id's bit pattern. */
  private def toFaceIJ(id: Long): (Int, Int, Int) = {
    val face = (id >>> 61).toInt
    var bits = face & SwapMask
    var i = 0; var j = 0
    var k = 7
    while (k >= 0) {
      val nbits = if (k == 7) MaxLevel - 7 * LookupBits else LookupBits
      bits += ((id >>> (k * 2 * LookupBits + 1)).toInt & ((1 << (2 * nbits)) - 1)) << 2
      bits = lookupIJ(bits)
      i += (bits >> (LookupBits + 2)) << (k * LookupBits)
      j += ((bits >> 2) & ((1 << LookupBits) - 1)) << (k * LookupBits)
      bits &= (SwapMask | InvertMask)
      k -= 1
    }
    (face, i, j)
  }

  /** Published FromFaceIJWrap: out-of-face (i,j) re-projected through
    * the LINEAR st↦uv mapping (exact inverse pair, so in-face inputs
    * round-trip bit-identically) and the cube geometry onto the
    * adjacent face. */
  private def fromFaceIJWrap(faceIn: Int, iIn: Int, jIn: Int): Long = {
    val kMax = 1 << MaxLevel
    val i = math.max(-1, math.min(kMax, iIn))
    val j = math.max(-1, math.min(kMax, jIn))
    val kScale = 1.0 / kMax
    val kLimit = 1.0 + 2.220446049250313e-16
    val u = math.max(-kLimit, math.min(kLimit, kScale * (2.0 * (i - kMax / 2) + 1.0)))
    val v = math.max(-kLimit, math.min(kLimit, kScale * (2.0 * (j - kMax / 2) + 1.0)))
    val (x, y, z) = faceUVtoXYZ(faceIn, u, v)
    val (f2, u2, v2) = xyzToFaceUV(x, y, z)
    def stToIJlin(s: Double): Int =
      math.max(0, math.min(kMax - 1, Math.round(kMax * s - 0.5).toInt))
    fromFaceIJ(f2, stToIJlin(0.5 * (u2 + 1.0)), stToIJlin(0.5 * (v2 + 1.0)))
  }

  /** geo_s2cell_to_polygon(token): the cell's boundary quad as a
    * GeoJSON Polygon (closed ring, ij-corner order — consistent with
    * the covering's intersection quad). Null on malformed tokens. */
  def cellPolygon(tok: UTF8String): UTF8String = {
    val id = tokenToId(tok.toString)
    if (id == 0L || !isValidId(id)) return null
    val q = cellQuad(id)
    val sb = new java.lang.StringBuilder(96)
    sb.append("{\"type\":\"Polygon\",\"coordinates\":[[")
    var k = 0
    while (k <= 4) {
      val i = (k % 4) * 2
      if (k > 0) sb.append(',')
      sb.append('[').append(q(i)).append(',').append(q(i + 1)).append(']')
      k += 1
    }
    sb.append("]]}")
    UTF8String.fromString(sb.toString)
  }

  /** geo_s2cell_neighbors(token): the 8 same-level neighbors (edge +
    * vertex; 7 distinct at cube corners — deduped, algorithm order),
    * crossing cube faces via fromFaceIJWrap — the published
    * AppendAllNeighbors walk. Null on malformed tokens. */
  def neighbors(tok: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val id = tokenToId(tok.toString)
    if (id == 0L || !isValidId(id)) return null
    val level = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
    val size = 1 << (MaxLevel - level)
    val kMax = 1 << MaxLevel
    val (face, i0, j0) = toFaceIJ(id)
    val i = i0 & -size
    val j = j0 & -size
    val lsb = 1L << (2 * (MaxLevel - level))
    def nbr(cond: Boolean, ii: Int, jj: Int): Long = {
      val leaf = if (cond) fromFaceIJ(face, ii, jj) else fromFaceIJWrap(face, ii, jj)
      (leaf & -lsb) | lsb
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var k = -size
    var done = false
    while (!done) {
      val sameFace =
        if (k < 0) j + k >= 0
        else if (k >= size) j + k < kMax
        else true
      if (k >= 0 && k < size) {
        out += nbr(j - size >= 0, i + k, j - size)
        out += nbr(j + size < kMax, i + k, j + size)
      }
      out += nbr(sameFace && i - size >= 0, i - size, j + k)
      out += nbr(sameFace && i + size < kMax, i + size, j + k)
      if (k >= size) done = true else k += size
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray.map(n => UTF8String.fromString(idToToken(n))))
  }

  private def stToUVd(w: Double): Double =
    if (w >= 0.5) (1.0 / 3.0) * (4.0 * w * w - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - w) * (1.0 - w))

  private def lonLatOf(face: Int, u: Double, v: Double): (Double, Double) = {
    val (x, y, z) = faceUVtoXYZ(face, u, v)
    (math.toDegrees(math.atan2(y, x)),
      math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  }

  /** The cell's 4 boundary corners as lon/lat, in ring order. */
  private def cellQuad(id: Long): Array[Double] = {
    val (face, i, j) = toFaceIJ(id)
    val level = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)
    val size = 1 << (MaxLevel - level)
    val i0 = i & -size; val j0 = j & -size
    val kMax = (1 << MaxLevel).toDouble
    def uvAt(x: Int) = stToUVd(x / kMax)
    val (u0, u1) = (uvAt(i0), uvAt(i0 + size))
    val (v0, v1) = (uvAt(j0), uvAt(j0 + size))
    val cs = Array((u0, v0), (u1, v0), (u1, v1), (u0, v1))
    val out = new Array[Double](8)
    var k = 0
    while (k < 4) {
      val (lon, lat) = lonLatOf(face, cs(k)._1, cs(k)._2)
      out(2 * k) = lon; out(2 * k + 1) = lat
      k += 1
    }
    out
  }

  // planar even-odd ray cast over closed rings — the SAME pinned rule
  // as the column-level geo_point_in_polygon
  private def inRings(px: Double, py: Double, rings: Array[Array[Double]]): Boolean = {
    var crossings = 0
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var a = 0
      while (a < n) {
        val b = (a + 1) % n
        val x1 = ring(2 * a); val y1 = ring(2 * a + 1)
        val x2 = ring(2 * b); val y2 = ring(2 * b + 1)
        if ((y1 > py) != (y2 > py) && px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
          crossings += 1
        a += 1
      }
      r += 1
    }
    (crossings & 1) == 1
  }

  private def segsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                            cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def o(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val o1 = o(ax, ay, bx, by, cx, cy); val o2 = o(ax, ay, bx, by, dx, dy)
    val o3 = o(cx, cy, dx, dy, ax, ay); val o4 = o(cx, cy, dx, dy, bx, by)
    (o1 * o2 < 0 && o3 * o4 < 0) ||
      (o1 == 0 && between1(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && between1(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && between1(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && between1(cx, cy, dx, dy, bx, by))
  }
  private def between1(ax: Double, ay: Double, bx: Double, by: Double,
                       px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  private def quadIntersectsPolygon(quad: Array[Double], rings: Array[Array[Double]]): Boolean = {
    // any quad corner inside the polygon
    var k = 0
    while (k < 4) {
      if (inRings(quad(2 * k), quad(2 * k + 1), rings)) return true
      k += 1
    }
    // any polygon vertex inside the quad
    val quadRing = Array(quad)
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var a = 0
      while (a < ring.length / 2) {
        if (inRings(ring(2 * a), ring(2 * a + 1), quadRing)) return true
        a += 1
      }
      r += 1
    }
    // any edge crossing
    r = 0
    while (r < rings.length) {
      val ring = rings(r)
      val n = ring.length / 2
      var a = 0
      while (a < n) {
        val b = (a + 1) % n
        k = 0
        while (k < 4) {
          val k2 = (k + 1) % 4
          if (segsIntersect(ring(2 * a), ring(2 * a + 1), ring(2 * b), ring(2 * b + 1),
              quad(2 * k), quad(2 * k + 1), quad(2 * k2), quad(2 * k2 + 1))) return true
          k += 1
        }
        a += 1
      }
      r += 1
    }
    false
  }

  private def quadIntersectsLine(quad: Array[Double], pts: Array[Double]): Boolean = {
    val quadRing = Array(quad)
    val n = pts.length / 2
    // any line vertex inside the quad
    var a = 0
    while (a < n) {
      if (inRings(pts(2 * a), pts(2 * a + 1), quadRing)) return true
      a += 1
    }
    // any segment crossing a quad edge (a segment passing THROUGH the
    // quad with both endpoints outside crosses two edges)
    a = 0
    while (a < n - 1) {
      var k = 0
      while (k < 4) {
        val k2 = (k + 1) % 4
        if (segsIntersect(pts(2 * a), pts(2 * a + 1), pts(2 * a + 2), pts(2 * a + 3),
            quad(2 * k), quad(2 * k + 1), quad(2 * k2), quad(2 * k2 + 1))) return true
        k += 1
      }
      a += 1
    }
    false
  }

  private val coverMappers = new ThreadLocal[com.fasterxml.jackson.databind.ObjectMapper] {
    override def initialValue() = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** geo_line_to_s2cells(line, level): the level-`level` cells
    * intersecting the GeoJSON LineString — the line-join covering,
    * [[polygonCover]]'s exact stance (PLANAR lon/lat intersection
    * tests, BFS over the 8-neighbor graph from the vertex cells — a
    * connected curve's covering is 8-connected — ascending-id tokens,
    * loud 65536-cell cap, malformed/level-out-of-range null). Kusto's
    * optional buffer radius is outside the documented subset (the
    * no-buffer stance). */
  def lineCover(lineJson: UTF8String, level: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (level < 0 || level > MaxLevel) return null
    val pts: Array[Double] =
      try {
        val root = coverMappers.get().readTree(lineJson.toString)
        if (root == null || !"LineString".equals(
            if (root.get("type") == null) null else root.get("type").asText())) return null
        val cs = root.get("coordinates")
        if (cs == null || !cs.isArray || cs.size() < 2) return null
        val flat = new Array[Double](2 * cs.size())
        var a = 0
        while (a < cs.size()) {
          val pt = cs.get(a)
          if (!pt.isArray || pt.size() < 2) return null
          flat(2 * a) = pt.get(0).asDouble()
          flat(2 * a + 1) = pt.get(1).asDouble()
          a += 1
        }
        flat
      } catch { case _: Exception => return null }
    def cellOf(lon: Double, lat: Double): Long = {
      val t = token(lon, lat, level)
      if (t == null) 0L else tokenToId(t.toString)
    }
    val included = scala.collection.mutable.Set.empty[Long]
    val visited = scala.collection.mutable.Set.empty[Long]
    val seeds = scala.collection.mutable.Set.empty[Long]
    val queue = scala.collection.mutable.Queue.empty[Long]
    var a = 0
    while (a < pts.length / 2) {
      val c = cellOf(pts(2 * a), pts(2 * a + 1))
      if (c != 0L && visited.add(c)) { seeds += c; queue += c }
      a += 1
    }
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      // vertex cells intersect by construction (they contain a vertex)
      if (seeds(c) || quadIntersectsLine(cellQuad(c), pts)) {
        included += c
        if (included.size > 65536) return null
        val nbrs = neighbors(UTF8String.fromString(idToToken(c)))
        var k = 0
        while (k < nbrs.numElements()) {
          val n = tokenToId(nbrs.getUTF8String(k).toString)
          if (n != 0L && visited.add(n)) queue += n
          k += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      included.toArray.sorted.map(n => UTF8String.fromString(idToToken(n))))
  }

  /** geo_polygon_to_s2cells(polygon, level): the level-`level` cells
    * intersecting the GeoJSON polygon — Kusto's polygon-join covering.
    * PINNED determinizations (documented subset, consistent with the
    * rest of the geo ring): intersection is tested in the PLANAR
    * lon/lat plane (the geo_point_in_polygon even-odd rule) between the
    * polygon rings and each cell's 4 boundary corners, so coverings and
    * point cells agree on membership away from the antimeridian/poles;
    * holes exclude per even-odd. Search is a BFS over the 8-neighbor
    * graph seeded at the vertex cells (a connected polygon's covering
    * is 8-connected). Output: tokens in ascending cell-id order. Null
    * on malformed polygons, level outside 0..30, or coverings past the
    * 65536-cell cap (the loud-bound stance). */
  def polygonCover(polyJson: UTF8String, level: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (level < 0 || level > MaxLevel) return null
    val rings: Array[Array[Double]] =
      try {
        val root = coverMappers.get().readTree(polyJson.toString)
        if (root == null || !"Polygon".equals(
            if (root.get("type") == null) null else root.get("type").asText())) return null
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
            flat(2 * a) = pt.get(0).asDouble()
            flat(2 * a + 1) = pt.get(1).asDouble()
            a += 1
          }
          out(r) = flat
          r += 1
        }
        out
      } catch { case _: Exception => return null }
    val lsb = 1L << (2 * (MaxLevel - level))
    def cellOf(lon: Double, lat: Double): Long = {
      val t = token(lon, lat, level)
      if (t == null) 0L else tokenToId(t.toString)
    }
    val included = scala.collection.mutable.Set.empty[Long]
    val visited = scala.collection.mutable.Set.empty[Long]
    val seeds = scala.collection.mutable.Set.empty[Long]
    val queue = scala.collection.mutable.Queue.empty[Long]
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var a = 0
      while (a < ring.length / 2) {
        val c = cellOf(ring(2 * a), ring(2 * a + 1))
        if (c != 0L && visited.add(c)) { seeds += c; queue += c }
        a += 1
      }
      r += 1
    }
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      // a vertex cell intersects BY CONSTRUCTION (it contains the
      // vertex) — don't let planar epsilon on the quad boundary kill
      // the BFS seed
      if (seeds(c) || quadIntersectsPolygon(cellQuad(c), rings)) {
        included += c
        if (included.size > 65536) return null
        val nbrs = neighbors(UTF8String.fromString(idToToken(c)))
        var k = 0
        while (k < nbrs.numElements()) {
          val n = tokenToId(nbrs.getUTF8String(k).toString)
          if (n != 0L && visited.add(n)) queue += n
          k += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      included.toArray.sorted.map(n => UTF8String.fromString(idToToken(n))))
  }

  /** Encode: token of the level-`level` cell containing (lon, lat);
    * null for out-of-range coordinates or level (0..30). */
  def token(lonDeg: Double, latDeg: Double, level: Int): UTF8String = {
    if (level < 0 || level > MaxLevel ||
        java.lang.Double.isNaN(lonDeg) || java.lang.Double.isNaN(latDeg) ||
        lonDeg < -180.0 || lonDeg > 180.0 || latDeg < -90.0 || latDeg > 90.0)
      return null
    val phi = math.toRadians(latDeg)
    val theta = math.toRadians(lonDeg)
    val cosphi = math.cos(phi)
    val x = cosphi * math.cos(theta)
    val y = cosphi * math.sin(theta)
    val z = math.sin(phi)
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val axis = if (ax > ay) { if (ax > az) 0 else 2 } else { if (ay > az) 1 else 2 }
    val comp = if (axis == 0) x else if (axis == 1) y else z
    val face = if (comp < 0) axis + 3 else axis
    var u = 0.0; var v = 0.0
    face match {
      case 0 => u = y / x; v = z / x
      case 1 => u = -x / y; v = z / y
      case 2 => u = -x / z; v = -y / z
      case 3 => u = z / x; v = y / x
      case 4 => u = z / y; v = -x / y
      case _ => u = -y / z; v = -x / z
    }
    def uvToST(w: Double): Double =
      if (w >= 0) 0.5 * math.sqrt(1.0 + 3.0 * w) else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)
    def stToIJ(s: Double): Int = {
      val lim = 1 << MaxLevel
      math.max(0, math.min(lim - 1, math.floor(s * lim).toInt))
    }
    val leaf = fromFaceIJ(face, stToIJ(uvToST(u)), stToIJ(uvToST(v)))
    val lsb = 1L << (2 * (MaxLevel - level))
    UTF8String.fromString(idToToken((leaf & -lsb) | lsb))
  }

  /** Decode: GeoJSON point at the EXACT cell center; malformed tokens
    * (bad chars, bad sentinel, face > 5) → null. */
  def centralPoint(tok: UTF8String): UTF8String = {
    val id = tokenToId(tok.toString)
    if (id == 0L || !isValidId(id)) return null
    val (face, i, j) = toFaceIJ(id)
    // center offset in (si, ti) half-leaf units: leaf centers sit at
    // odd si; a non-leaf cell's center depends on the curve parity
    val delta =
      if ((id & 1) != 0) 1
      else if (((i ^ (id >>> 2).toInt) & 1) != 0) 2
      else 0
    val s = (2L * i + delta).toDouble / (1L << (MaxLevel + 1)).toDouble
    val t = (2L * j + delta).toDouble / (1L << (MaxLevel + 1)).toDouble
    def stToUV(w: Double): Double =
      if (w >= 0.5) (1.0 / 3.0) * (4.0 * w * w - 1.0)
      else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - w) * (1.0 - w))
    val u = stToUV(s); val v = stToUV(t)
    var x = 0.0; var y = 0.0; var z = 0.0
    face match {
      case 0 => x = 1; y = u; z = v
      case 1 => x = -u; y = 1; z = v
      case 2 => x = -u; y = -v; z = 1
      case 3 => x = -1; y = -v; z = -u
      case 4 => x = v; y = -1; z = -u
      case _ => x = v; y = u; z = -1
    }
    val lon = math.toDegrees(math.atan2(y, x))
    val lat = math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y)))
    UTF8String.fromString(s"""{"type":"Point","coordinates":[$lon,$lat]}""")
  }
}

/** geo_point_to_s2cell(lon, lat, level-literal) → S2 token string. */
case class S2CellToken(left: Expression, right: Expression, level: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_point_to_s2cell requires (double, double), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    S2CellOps.token(lon.asInstanceOf[Double], lat.asInstanceOf[Double], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lon, lat) => s"""
      ${ev.value} = graft.functions.S2CellOps.token($lon, $lat, $level);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): S2CellToken =
    copy(left = newLeft, right = newRight)
}

/** geo_polygon_to_s2cells(polygon, level-literal) → tokens of the
  * level cells intersecting the polygon (see S2CellOps.polygonCover). */
case class S2PolygonCover(child: Expression, level: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_polygon_to_s2cells", child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    S2CellOps.polygonCover(a.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.S2CellOps.polygonCover($c, $level);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): S2PolygonCover =
    copy(child = newChild)
}

case class S2LineCover(child: Expression, level: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_line_to_s2cells", child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    S2CellOps.lineCover(a.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.S2CellOps.lineCover($c, $level);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): S2LineCover =
    copy(child = newChild)
}

/** geo_s2cell_to_polygon(token) → the cell's boundary quad. */
case class S2CellPolygon(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_s2cell_to_polygon", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    S2CellOps.cellPolygon(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.S2CellOps.cellPolygon($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): S2CellPolygon =
    copy(child = newChild)
}

/** geo_s2cell_neighbors(token) → dynamic array of the same-level
  * neighbor tokens (8; 7 distinct at cube corners). */
case class S2CellNeighbors(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_s2cell_neighbors", child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    S2CellOps.neighbors(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.S2CellOps.neighbors($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): S2CellNeighbors =
    copy(child = newChild)
}

/** geo_s2cell_to_central_point(token) → GeoJSON point at the cell
  * center (re-encodes to the same token at the same level). */
case class S2CellCentralPoint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_s2cell_to_central_point", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    S2CellOps.centralPoint(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.S2CellOps.centralPoint($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): S2CellCentralPoint =
    copy(child = newChild)
}
