package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_geohash_to_central_point(hash)` — inverse of the engine's
  * geohash encode: unpack the interleaved lon/lat bit streams (lon
  * first, standard geohash) and return the CELL CENTER as a GeoJSON
  * point (`{"type":"Point","coordinates":[lon,lat]}` — Kusto's dynamic
  * shape, so `.coordinates[0]` postfix access works). Malformed input
  * (empty, > 12 chars, non-base32 chars) → null. The center always
  * re-encodes to the same hash at the same precision — the exact
  * round-trip contract the gate checks. */
object GeoHashOps {
  private[functions] val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  private[functions] val Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def centralPoint(hash: UTF8String): UTF8String = {
    val h = hash.toString
    if (h.isEmpty || h.length > 12) return null
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true // lon first
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) Idx(c.toInt) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2.0
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2.0
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    val lon = (lonLo + lonHi) / 2.0
    val lat = (latLo + latHi) / 2.0
    UTF8String.fromString(s"""{"type":"Point","coordinates":[$lon,$lat]}""")
  }
}

object GeoHashNeighborOps {
  import GeoHashOps.{Alphabet, Idx}

  /** Scala-side standard geohash encode (the compiler's column encoder
    * unrolled; same bit order: lon first). */
  private[functions] def encode(lon: Double, lat: Double, prec: Int): String = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    val sb = new java.lang.StringBuilder(prec)
    var i = 0
    while (i < prec) {
      var v = 0
      var b = 0
      while (b < 5) {
        v <<= 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2.0
          if (lon >= mid) { v |= 1; lonLo = mid } else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2.0
          if (lat >= mid) { v |= 1; latLo = mid } else latHi = mid
        }
        evenBit = !evenBit
        b += 1
      }
      sb.append(Alphabet.charAt(v))
      i += 1
    }
    sb.toString
  }

  /** geo_geohash_neighbors(hash): the up-to-8 surrounding cells at the
    * same precision — center ± one cell width/height, longitude
    * wrapping across the antimeridian, latitude neighbors past the
    * poles DROPPED (pinned; there is no cell there). Row-major
    * N→S / W→E order, self excluded. Null on malformed hashes. */
  def neighbors(hash: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = hash.toString
    if (h.isEmpty || h.length > 12) return null
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) Idx(c.toInt) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2.0
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2.0
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    val w = lonHi - lonLo; val hgt = latHi - latLo
    val clon = (lonLo + lonHi) / 2.0; val clat = (latLo + latHi) / 2.0
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var dy = 1
    while (dy >= -1) {
      var dx = -1
      while (dx <= 1) {
        if (!(dx == 0 && dy == 0)) {
          val lat2 = clat + dy * hgt
          if (lat2 > -90.0 && lat2 < 90.0) {
            var lon2 = clon + dx * w
            if (lon2 >= 180.0) lon2 -= 360.0
            if (lon2 < -180.0) lon2 += 360.0
            out += UTF8String.fromString(encode(lon2, lat2, h.length))
          }
        }
        dx += 1
      }
      dy -= 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

object GeoHashPolygonOps {
  import GeoHashOps.Idx

  /** geo_geohash_to_polygon(hash): the cell's bounds rectangle as a
    * closed GeoJSON Polygon ring (SW → SE → NE → NW → SW). Null on
    * malformed hashes. */
  def polygon(hash: UTF8String): UTF8String = {
    val h = hash.toString
    if (h.isEmpty || h.length > 12) return null
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var i = 0
    while (i < h.length) {
      val c = h.charAt(i)
      val v = if (c < 128) Idx(c.toInt) else -1
      if (v < 0) return null
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2.0
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2.0
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    UTF8String.fromString(
      s"""{"type":"Polygon","coordinates":[[[$lonLo,$latLo],[$lonHi,$latLo],[$lonHi,$latHi],[$lonLo,$latHi],[$lonLo,$latLo]]]}""")
  }
}

/** geo_geohash_to_polygon(hash) → the cell bounds rectangle. */
case class GeohashPolygon(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_geohash_to_polygon", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    GeoHashPolygonOps.polygon(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoHashPolygonOps.polygon($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GeohashPolygon =
    copy(child = newChild)
}

/** geo_geohash_neighbors(hash) → dynamic array of surrounding cells. */
case class GeohashNeighbors(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_geohash_neighbors", child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    GeoHashNeighborOps.neighbors(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoHashNeighborOps.neighbors($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GeohashNeighbors =
    copy(child = newChild)
}

case class GeohashCentralPoint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("geo_geohash_to_central_point", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    GeoHashOps.centralPoint(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoHashOps.centralPoint($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): GeohashCentralPoint =
    copy(child = newChild)
}
