package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** High-latitude accuracy gate for the buffer family (round 18).
  *
  * The buffers offset in a LOCAL equirectangular frame about the
  * shape's bbox-center latitude lat0 (x = R·Δlon·cos lat0): a boundary
  * point at latitude lat carries an east-west metric error of
  * |cos lat − cos lat0| / cos lat0 ≈ tan|lat0| · Δφ per unit distance,
  * so the buffer boundary sits within
  *
  *   err ≤ r · tan|lat0| · Δφ,   Δφ = (shape half-lat-span + r/R) rad
  *
  * of the true geodesic r-contour (plus the polygonization tolerance).
  * This spec measures that at lat 60° with a deliberately large radius
  * (err is quadratic in r): probes placed at true geodesic distance
  * r ± 2·err from the cap center must classify inside/outside — the
  * frame error is BOUNDED, not just "degrades with |lat|". */
class GeoBufferLatitudeSpec extends AnyFunSuite {
  private val R = 6371009.0
  private def u(s: String) = UTF8String.fromString(s)

  /** Destination point ~distance d (meters) at bearing θ from (lon, lat),
    * second-order accurate local spherical move — exact enough against
    * the 2×err assertion margins. */
  private def move(lon: Double, lat: Double, d: Double, thetaDeg: Double): (Double, Double) = {
    val th = math.toRadians(thetaDeg)
    val dLat = d * math.cos(th) / R
    val latMid = math.toRadians(lat) + dLat / 2
    val dLon = d * math.sin(th) / (R * math.cos(latMid))
    (lon + math.toDegrees(dLon), lat + math.toDegrees(dLat))
  }

  test("line buffer at lat 60: boundary within the documented equirectangular bound") {
    val lat = 60.0
    val r = 100000.0 // 100 km: err ≈ r·tan60°·(r/R) ≈ 2.7 km
    val tol = 50.0
    // 20 km east-west segment at lat 60
    val (lonB, latB) = move(20.0, lat, 20000.0, 90.0)
    val line = s"""{"type":"LineString","coordinates":[[20.0,$lat],[$lonB,$latB]]}"""
    val buf = GeoBufferOps.lineBuffer(u(line), r, tol)
    assert(buf != null, "buffer unexpectedly null")
    val err = r * math.tan(math.toRadians(lat)) * (r / R) + tol
    // probes fan out from the WEST cap center across bearings; each
    // placed at true geodesic distance r ∓ 2·err
    for (theta <- Seq(0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0, 315.0)) {
      val (inLon, inLat) = move(20.0, lat, r - 2 * err, theta)
      val in = GeoPredOps.pointInPolygon(inLon, inLat, buf)
      assert(in != null && in.booleanValue,
        s"probe at r-2err, bearing $theta must be inside (err bound $err m)")
      val (outLon, outLat) = move(20.0, lat, r + 2 * err, theta)
      // distance to the whole segment: a probe at bearing 45/90/135 from
      // the WEST cap center is nearer to the segment body than to the
      // cap — only due-north and the western half qualify for the
      // outside assertion
      if (theta == 0.0 || theta >= 180.0) {
        val out = GeoPredOps.pointInPolygon(outLon, outLat, buf)
        assert(out != null && !out.booleanValue,
          s"probe at r+2err, bearing $theta must be outside (err bound $err m)")
      }
    }
  }

  test("polygon buffer at lat 60: outward offset within the bound, north and south") {
    val lat = 60.0
    val r = 80000.0
    val tol = 50.0
    // small rectangle ~0.2° x 0.1° at lat 60
    val poly = s"""{"type":"Polygon","coordinates":[[[10.0,$lat],[10.2,$lat],[10.2,${lat + 0.1}],[10.0,${lat + 0.1}],[10.0,$lat]]]}"""
    val buf = GeoBufferOps.polygonBuffer(u(poly), r, tol)
    assert(buf != null, "polygon buffer unexpectedly null")
    val dphi = math.toRadians(0.05) + r / R
    val err = r * math.tan(math.toRadians(lat)) * dphi + tol
    // due north of the top edge and due south of the bottom edge
    for ((edgeLat, theta) <- Seq((lat + 0.1, 0.0), (lat, 180.0))) {
      val (inLon, inLat) = move(10.1, edgeLat, r - 2 * err, theta)
      val in = GeoPredOps.pointInPolygon(inLon, inLat, buf)
      assert(in != null && in.booleanValue, s"inside probe failed at bearing $theta")
      val (outLon, outLat) = move(10.1, edgeLat, r + 2 * err, theta)
      val out = GeoPredOps.pointInPolygon(outLon, outLat, buf)
      assert(out != null && !out.booleanValue, s"outside probe failed at bearing $theta")
    }
    // and due east at the mid latitude (the distorted axis)
    val (inLon, inLat) = move(10.2, lat + 0.05, r - 2 * err, 90.0)
    assert(GeoPredOps.pointInPolygon(inLon, inLat, buf).booleanValue)
    val (outLon, outLat) = move(10.2, lat + 0.05, r + 2 * err, 90.0)
    assert(!GeoPredOps.pointInPolygon(outLon, outLat, buf).booleanValue)
  }
}
