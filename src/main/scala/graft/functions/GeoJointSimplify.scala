package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `geo_simplify_polygons_array(polygons, tolerance)` — JOINT
  * topology-preserving simplification of a polygon set (admin
  * boundaries, parcel maps): boundaries SHARED between polygons must
  * simplify identically on both sides, or the simplified set grows
  * slivers and overlaps (the reason a per-polygon DP is worse than
  * absent — SURVEY's round-15 boundary note, closed here).
  *
  * Pinned algorithm:
  *  1. every ring's edges are keyed UNDIRECTED by their exact endpoint
  *     coordinates; an edge's SIGNATURE is the sorted set of
  *     (polygon, ring) users — shared borders must match exactly
  *     (same-source data; the documented subset), a ring reusing one of
  *     its own edges is loudly null;
  *  2. each ring cuts into maximal chains of constant signature; cut
  *     vertices (junctions — signature changes, by symmetry identical
  *     in every sharer's traversal) are always kept;
  *  3. each distinct chain canonicalizes (lexicographically smaller
  *     endpoint first; a cut-free ring rotates to its smallest vertex
  *     and walks toward its smaller neighbor) and is simplified ONCE
  *     with the same Douglas–Peucker rule as geo_polygon_simplify —
  *     every sharer then reassembles from the SAME kept subsequence,
  *     so shared borders stay vertex-identical by construction;
  *  4. a ring that simplifies below 3 distinct vertices is loudly null
  *     (never a silent floor walk that could diverge between sharers).
  *
  * Input: array of GeoJSON Polygon strings; output: same-length array
  * of simplified Polygon strings (rings in original order, closed,
  * starting at each ring's first kept vertex in traversal order).
  * Note the anchor pin: an UNSHARED ring anchors at its canonical
  * smallest vertex, so isolated polygons may differ from
  * geo_polygon_simplify's (first-vertex-anchored) output — both are
  * valid DP subsets; the joint guarantee is what this function adds.
  */
object GeoJointSimplifyOps {
  private type Pt = (Double, Double)

  private def open(xs: Array[Double], ys: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n >= 2 && xs(0) == xs(n - 1) && ys(0) == ys(n - 1))
      (xs.take(n - 1), ys.take(n - 1))
    else (xs, ys)
  }

  def simplifyPolygonsArray(arr: Array[String], tolM: Double): Array[String] = {
    if (!(tolM > 0) || arr == null || arr.isEmpty) return null
    try {
      // ---- parse all polygons to open rings ----
      val polys: Array[Array[Array[Pt]]] = arr.map { json =>
        val rings = GeoPredOps.parsePoly(json)
        if (rings == null) return null
        rings.map { flat =>
          val n = flat.length / 2
          if (n < 4) return null // closed ring floor
          val xs = Array.tabulate(n)(i => flat(2 * i))
          val ys = Array.tabulate(n)(i => flat(2 * i + 1))
          val (ox, oy) = open(xs, ys)
          if (ox.length < 3) return null
          Array.tabulate(ox.length)(i => (ox(i), oy(i)))
        }
      }
      // ---- undirected edge signatures ----
      def ekey(a: Pt, b: Pt): (Pt, Pt) =
        if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) (a, b) else (b, a)
      val usage = scala.collection.mutable.HashMap.empty[(Pt, Pt), List[(Int, Int)]]
      for (p <- polys.indices; r <- polys(p).indices) {
        val ring = polys(p)(r)
        val seen = scala.collection.mutable.HashSet.empty[(Pt, Pt)]
        for (i <- ring.indices) {
          val k = ekey(ring(i), ring((i + 1) % ring.length))
          if (!seen.add(k)) return null // ring reuses its own edge
          usage(k) = (p, r) :: usage.getOrElse(k, Nil)
        }
      }
      val sigOf: ((Pt, Pt)) => Vector[(Int, Int)] =
        k => usage(k).sortBy(identity).toVector
      // ---- chain registry: (canonical vertex seq, closed) → keep mask ----
      // keyed by the closed flag too: a cut-free ring's canonical rotation
      // and an OPEN shared chain with the same vertex sequence run the DP
      // in different modes (closed appends the head), so sharing one mask
      // across modes would silently mis-simplify
      val masks = scala.collection.mutable.HashMap.empty[(Vector[Pt], Boolean), Array[Boolean]]
      def maskFor(chain: Vector[Pt], closed: Boolean): Array[Boolean] =
        masks.getOrElseUpdate((chain, closed), {
          val pts = if (closed) chain :+ chain.head else chain
          val keep = GeoSimplifyOps.dpKeep(
            pts.map(_._1).toArray, pts.map(_._2).toArray, tolM)
          if (closed) keep.take(chain.length) else keep
        })
      // ---- per ring: cut into chains, simplify, reassemble ----
      val out = Array.ofDim[String](arr.length)
      val sb = new java.lang.StringBuilder(256)
      for (p <- polys.indices) {
        sb.setLength(0)
        sb.append("{\"type\":\"Polygon\",\"coordinates\":[")
        for (r <- polys(p).indices) {
          val ring = polys(p)(r)
          val n = ring.length
          val sigs = Array.tabulate(n)(i => sigOf(ekey(ring(i), ring((i + 1) % n))))
          val cuts = (0 until n).filter(i => sigs((i + n - 1) % n) != sigs(i))
          val kept = scala.collection.mutable.ArrayBuffer.empty[Pt]
          if (cuts.isEmpty) {
            // uniform ring: canonical rotation + closed-chain DP
            var s = 0
            for (i <- 1 until n)
              if (ring(i)._1 < ring(s)._1 ||
                  (ring(i)._1 == ring(s)._1 && ring(i)._2 < ring(s)._2)) s = i
            val fwd = ring((s + 1) % n); val bwd = ring((s + n - 1) % n)
            val dir = if (fwd._1 < bwd._1 || (fwd._1 == bwd._1 && fwd._2 <= bwd._2)) 1 else -1
            val canon = Vector.tabulate(n)(j => ring(((s + dir * j) % n + n) % n))
            val keep = maskFor(canon, closed = true)
            // back to traversal order: position of ring(i) in canon
            for (i <- 0 until n) {
              val j = (((i - s) * dir) % n + n) % n
              if (keep(j)) kept += ring(i)
            }
          } else {
            // walk chains between cuts, in traversal order
            val cs = cuts.toArray
            for (ci <- cs.indices) {
              val a = cs(ci)
              val b = cs((ci + 1) % cs.length)
              val len = ((b - a) % n + n) % n match { case 0 => n case l => l }
              val seq = Vector.tabulate(len + 1)(j => ring((a + j) % n))
              val fwdCanon = seq.head._1 < seq.last._1 ||
                (seq.head._1 == seq.last._1 && seq.head._2 <= seq.last._2)
              val canon = if (fwdCanon) seq else seq.reverse
              val keepC = maskFor(canon, closed = false)
              val keep = if (fwdCanon) keepC else keepC.reverse
              // emit kept vertices, excluding the chain's last point (it
              // is the next chain's first — the junction emits once)
              for (j <- 0 until len) if (keep(j)) kept += seq(j)
            }
          }
          if (kept.map(identity).distinct.length < 3) return null
          if (r > 0) sb.append(',')
          sb.append('[')
          for (i <- kept.indices) {
            if (i > 0) sb.append(',')
            sb.append('[').append(kept(i)._1).append(',').append(kept(i)._2).append(']')
          }
          sb.append(",[").append(kept(0)._1).append(',').append(kept(0)._2).append(']')
          sb.append(']')
        }
        sb.append("]}")
        out(p) = sb.toString
      }
      out
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}

case class GeoSimplifyPolygonsArray(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val in = a.asInstanceOf[ArrayData]
    val strs = Array.tabulate(in.numElements()) { i =>
      if (in.isNullAt(i)) return null else in.getUTF8String(i).toString
    }
    val out = GeoJointSimplifyOps.simplifyPolygonsArray(strs, b.asInstanceOf[Double])
    if (out == null) null
    else new GenericArrayData(out.map(s => UTF8String.fromString(s): Any))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[GeoSimplifyPolygonsArray].getName
    val ref = ctx.addReferenceObj("jointSimplify", this, cls)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoSimplifyPolygonsArray =
    copy(left = l, right = r)
}
