package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Degenerate-contact fixtures for the polygon boolean engine (round
  * 18): vertex-touch, vertex-on-edge, edge-overlap, and shared-border
  * cases that the round-16/17 engine loudly nulled. Truth is
  * constructible: all operands are axis-aligned (or one lattice
  * triangle), so expected areas follow from interval inclusion-
  * exclusion and membership from interval logic. */
class GeoBoolDegenerateSpec extends AnyFunSuite {

  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$x1,$y1],[$x2,$y1],[$x2,$y2],[$x1,$y2],[$x1,$y1]]]}"""

  private def u8(s: String) = UTF8String.fromString(s)

  /** Net planar area of a Polygon/MultiPolygon result (holes negative). */
  private def area(j: UTF8String): Double = {
    assert(j != null, "unexpected null geometry")
    val rings = GeoBoolOps.parseSide(j.toString)
    assert(rings != null, s"result failed to parse: $j")
    rings.map(r => GeoBoolOps.signedArea2(r) / 2.0).sum
  }

  private def inter(a: String, b: String) = GeoBoolOps.intersection(u8(a), u8(b))
  private def union(a: String, b: String) = GeoBoolOps.union(u8(a), u8(b))

  test("shared-border union merges; zero-width intersection is null") {
    val a = rect(0, 0, 1, 1)
    val b = rect(1, 0, 2, 1)
    assert(inter(a, b) == null, "zero-width intersection must stay null (empty)")
    val u = union(a, b)
    assert(math.abs(area(u) - 2.0) < 1e-12, s"shared-border union area: $u")
    // the merged region's gross ring area matches too (no stray holes)
    val rings = GeoBoolOps.parseSide(u.toString)
    assert(math.abs(rings.map(r => math.abs(GeoBoolOps.signedArea2(r) / 2.0)).sum - 2.0) < 1e-12)
  }

  test("partial edge overlap: collinear sub-edge splitting is exact") {
    // B overlaps A's interior and shares a collinear bottom-edge run
    val a = rect(0, 0, 2, 2)
    val b = rect(1, 0, 3, 1)
    assert(math.abs(area(inter(a, b)) - 1.0) < 1e-12) // [1,2]x[0,1]
    assert(math.abs(area(union(a, b)) - 5.0) < 1e-12) // 4 + 2 - 1
  }

  test("vertex-touch (corner-to-corner): union keeps both, intersection empty") {
    val a = rect(0, 0, 1, 1)
    val b = rect(1, 1, 2, 2)
    assert(inter(a, b) == null)
    val u = union(a, b)
    assert(math.abs(area(u) - 2.0) < 1e-12)
    // two simple rings, never a figure-eight: each ring has |area| 1
    val rings = GeoBoolOps.parseSide(u.toString)
    assert(rings.length == 2, s"corner touch should yield two components: $u")
    assert(rings.forall(r => math.abs(math.abs(GeoBoolOps.signedArea2(r) / 2.0) - 1.0) < 1e-12))
  }

  test("vertex-on-edge: triangle apex on a rectangle edge") {
    val w = rect(0, 0, 6, 4)
    // apex (2,4) on w's top edge interior, body above
    val t = """{"type":"Polygon","coordinates":[[[2.0,4.0],[3.0,5.0],[1.0,5.0],[2.0,4.0]]]}"""
    assert(inter(w, t) == null, "point contact has no area")
    assert(math.abs(area(union(w, t)) - 25.0) < 1e-12) // 24 + 1
  }

  test("containment with shared border: intersection is the inner, union the outer") {
    val a = rect(0, 0, 2, 1)
    val b = rect(0, 0, 1, 1) // shares left+bottom(+part of top) border with a
    assert(math.abs(area(inter(a, b)) - 1.0) < 1e-12)
    assert(math.abs(area(union(a, b)) - 2.0) < 1e-12)
  }

  test("identical operands: intersection and union are the operand itself") {
    val a = rect(-1, -1, 2, 3)
    assert(math.abs(area(inter(a, a)) - 12.0) < 1e-12)
    assert(math.abs(area(union(a, a)) - 12.0) < 1e-12)
  }

  test("lattice rectangles: inclusion-exclusion holds across all contact classes") {
    // every (dx, dy) integer offset of a 2x2 square against [0,3]x[0,3]:
    // covers disjoint, corner-touch, edge-share, partial-edge-share,
    // proper overlap, and containment-with-shared-border
    val w = rect(0, 0, 3, 3)
    val aW = 9.0
    val aB = 4.0
    for (dx <- -3 to 4; dy <- -3 to 4) {
      val b = rect(dx, dy, dx + 2, dy + 2)
      val ix = math.max(0.0, math.min(3.0, dx + 2.0) - math.max(0.0, dx.toDouble))
      val iy = math.max(0.0, math.min(3.0, dy + 2.0) - math.max(0.0, dy.toDouble))
      val expInter = ix * iy
      val i = inter(w, b)
      if (expInter == 0.0) assert(i == null, s"offset ($dx,$dy): expected empty intersection")
      else assert(math.abs(area(i) - expInter) < 1e-12, s"offset ($dx,$dy) intersection")
      val u = union(w, b)
      assert(math.abs(area(u) - (aW + aB - expInter)) < 1e-12, s"offset ($dx,$dy) union")
    }
  }

  test("line clip degenerate contact: boundary riding, vertex touch, corner pass") {
    val w = rect(0, 0, 4, 4)
    def clip(line: String) = GeoBoolOps.lineClip(u8(line), u8(w))
    def chainLen(j: UTF8String): Double = {
      // planar length over all chains (test helper; inputs are axis-aligned)
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(j.toString)
      val cs = root.get("coordinates")
      val chains =
        if (root.get("type").asText == "LineString") Seq(cs)
        else (0 until cs.size()).map(cs.get)
      chains.map { c =>
        (0 until c.size() - 1).map { i =>
          val a = c.get(i); val b = c.get(i + 1)
          math.hypot(b.get(0).asDouble - a.get(0).asDouble,
                     b.get(1).asDouble - a.get(1).asDouble)
        }.sum
      }.sum
    }
    // rides the top edge for 2 units, then exits: boundary run INCLUDED
    val riding = clip("""{"type":"LineString","coordinates":[[1.0,4.0],[3.0,4.0],[3.0,6.0]]}""")
    assert(riding != null, "boundary-riding line must clip, not null")
    assert(math.abs(chainLen(riding) - 2.0) < 1e-12, s"got $riding")
    // touches the boundary at one point from outside: nothing inside
    val touch = clip("""{"type":"LineString","coordinates":[[-1.0,5.0],[1.0,3.9]]}""")
    val _ = touch // may be null or an empty-adjacent sliver-free result
    // passes exactly through the corner (4,4) diagonally: inside part kept
    val corner = clip("""{"type":"LineString","coordinates":[[2.0,2.0],[6.0,6.0]]}""")
    assert(corner != null)
    assert(math.abs(chainLen(corner) - 2.0 * math.sqrt(2)) < 1e-12, s"got $corner")
    // starts ON the boundary heading outward: excluded, not null-crashed
    val outward = clip("""{"type":"LineString","coordinates":[[2.0,4.0],[2.0,7.0]]}""")
    assert(outward == null, s"outward-from-boundary has no interior run: $outward")
    // starts ON the boundary heading inward: the whole run is inside
    val inward = clip("""{"type":"LineString","coordinates":[[2.0,4.0],[2.0,1.0]]}""")
    assert(inward != null && math.abs(chainLen(inward) - 3.0) < 1e-12, s"got $inward")
  }

  test("2lines degenerate contact: overlap segment, touch point, mixed collection") {
    def li(a: String, b: String) = GeoBoolOps.lineIntersect(u8(a), u8(b))
    val diag = """{"type":"LineString","coordinates":[[0.0,0.0],[4.0,4.0]]}"""
    // pure overlap -> LineString
    assert(li(diag, """{"type":"LineString","coordinates":[[1.0,1.0],[3.0,3.0]]}""").toString
      == """{"type":"LineString","coordinates":[[1.0,1.0],[3.0,3.0]]}""")
    // end-to-end collinear contact -> a point, not a zero-length segment
    assert(li(diag, """{"type":"LineString","coordinates":[[4.0,4.0],[8.0,8.0]]}""").toString
      == """{"type":"Point","coordinates":[4.0,4.0]}""")
    // vertex-on-interior touch -> the exact vertex
    assert(li(diag, """{"type":"LineString","coordinates":[[2.0,2.0],[5.0,0.0]]}""").toString
      == """{"type":"Point","coordinates":[2.0,2.0]}""")
    // an overlap run AND a separate transversal crossing -> collection
    // (the (2,2)->(2,4) leg touches diag only at the overlap's end,
    // which is absorbed; (2,4)->(4,2) crosses at (3,3))
    val mixed = li(diag,
      """{"type":"LineString","coordinates":[[1.0,1.0],[2.0,2.0],[2.0,4.0],[4.0,2.0]]}""")
    assert(mixed != null && mixed.toString.startsWith("""{"type":"GeometryCollection""""),
      s"got $mixed")
    assert(mixed.toString.contains("""[[1.0,1.0],[2.0,2.0]]""") &&
      mixed.toString.contains("""[3.0,3.0]"""), s"got $mixed")
  }

  test("hole contact: subtracting-shaped operands keep holes attached") {
    // A = square with a centered hole; B fills exactly the hole (shares
    // the full hole boundary). Union = solid square; intersection null
    // (B touches A only along the hole ring).
    val a = """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,4.0],[0.0,0.0]],[[1.0,1.0],[3.0,1.0],[3.0,3.0],[1.0,3.0],[1.0,1.0]]]}"""
    val b = rect(1, 1, 3, 3)
    assert(math.abs(area(union(a, b)) - 16.0) < 1e-12, "union must fill the hole")
    assert(inter(a, b) == null,
      "A touches B only along the hole boundary - no interior overlap")
  }

  test("snap-rounding: FP-perturbed shared border (1e-12°) equals the snapped truth") {
    // the round-19 gate: one operand carries the shared border a hair
    // off the grid — mixed-provenance FP noise that loudly nulled
    // before snap-rounding; must now resolve to the bit-identical case
    val a = rect(0, 0, 1, 1)
    val e = 1e-12
    val b = s"""{"type":"Polygon","coordinates":[[[${1 + e},${-e}],[2.0,0.0],[2.0,1.0],[${1 - e},${1 + e}],[${1 + e},${-e}]]]}"""
    assert(inter(a, b) == null, "zero-width intersection stays null after snapping")
    val u = union(a, b)
    assert(u != null, "perturbed shared border must snap to the exact case, not null")
    assert(math.abs(area(u) - 2.0) < 1e-9, s"snapped union area: $u")
    // and the snapped result equals the unperturbed (snapped-truth) result
    assert(u.toString == union(a, rect(1, 0, 2, 1)).toString,
      "perturbed operand must yield exactly the snapped truth")
  }

  test("snap-rounding: perturbed collinear overlap and vertex-on-edge resolve exactly") {
    val e = 1e-12
    // collinear bottom-edge run, perturbed off-grid on one operand
    val a = rect(0, 0, 2, 2)
    val b = s"""{"type":"Polygon","coordinates":[[[1.0,${-e}],[3.0,$e],[3.0,1.0],[1.0,1.0],[1.0,${-e}]]]}"""
    assert(math.abs(area(inter(a, b)) - 1.0) < 1e-9) // [1,2]x[0,1]
    assert(math.abs(area(union(a, b)) - 5.0) < 1e-9) // 4 + 2 - 1
    // vertex-on-edge with the apex 1e-12 off the edge
    val w = rect(0, 0, 6, 4)
    val t = s"""{"type":"Polygon","coordinates":[[[2.0,${4.0 - e}],[3.0,5.0],[1.0,5.0],[2.0,${4.0 - e}]]]}"""
    assert(inter(w, t) == null, "point contact has no area")
    assert(math.abs(area(union(w, t)) - 25.0) < 1e-9)
    // line riding a perturbed boundary: the forced-inside run survives
    val ride = GeoBoolOps.lineClip(
      u8(s"""{"type":"LineString","coordinates":[[1.0,${2.0 + e}],[3.0,${2.0 - e}]]}"""),
      u8(rect(0, 0, 2, 2)))
    assert(ride != null && ride.toString.contains("LineString"), s"got $ride")
  }

  test("snap-rounding: repeated vertices (zero-length segments) never fabricate geometry") {
    // a polyline with a repeated vertex ABOVE the polygon, whose x falls
    // inside an edge's x-span: pre-round-19 the zero-length segment
    // passed the collinearity test against that edge with param() at
    // ±Infinity clamping to a full forced-inside run — a bogus
    // zero-length 'LineString' at a point outside the polygon
    val clip = GeoBoolOps.lineClip(
      u8("""{"type":"LineString","coordinates":[[5.0,5.0],[5.0,5.0],[6.0,6.0]]}"""),
      u8(rect(0, 0, 6, 2)))
    assert(clip == null, s"zero-length segment fabricated geometry: $clip")
    // two disjoint polylines, one carrying a repeated vertex whose x
    // falls inside the other's span: same ±Infinity clamp pre-fix
    val li = GeoBoolOps.lineIntersect(
      u8("""{"type":"LineString","coordinates":[[5.0,5.0],[5.0,5.0],[6.0,5.0]]}"""),
      u8("""{"type":"LineString","coordinates":[[0.0,0.0],[6.0,0.0]]}"""))
    assert(li == null, s"zero-length segment fabricated an intersection: $li")
  }
}
