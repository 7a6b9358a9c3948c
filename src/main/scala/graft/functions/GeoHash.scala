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
  private val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Idx: Array[Int] = {
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
