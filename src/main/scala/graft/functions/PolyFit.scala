package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `(rsquare, coefficients, variance, rvariance, poly_fit) =
  * series_fit_poly(y [, x] [, degree])` — ordinary least-squares
  * polynomial fit per row (Kusto's series_fit_poly surface).
  *
  * Pinned semantics:
  *  - x defaults to 0..n−1 (the series index), like series_fit_line;
  *  - effective degree = min(degree, n−1) (an exact interpolation when
  *    the series is shorter than the requested degree + 1);
  *  - coefficients HIGHEST power first (Kusto's documented order);
  *  - normal equations solved by Gaussian elimination with partial
  *    pivoting — raw x powers, so very long series with high degrees
  *    are ill-conditioned exactly as Kusto documents (normalize x
  *    first); degree capped at 8 (loud analysis error above);
  *  - rsquare = 1 − SSres/SStot pinned 1.0 for constant series,
  *    variance = SStot/(n−1), rvariance = SSres/(n−1) — the same
  *    conventions as SeriesFitLine.
  *
  * Per-row O(n·d²) work, map-only; CodegenFallback because the solve
  * dominates the interpreted call overhead (the FFT/KStat stance). */
case class SeriesFitPoly(children: Seq[Expression], degree: Int)
  extends Expression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("rsquare", DoubleType),
    StructField("coefficients", ArrayType(DoubleType, containsNull = false)),
    StructField("variance", DoubleType),
    StructField("rvariance", DoubleType),
    StructField("poly_fit", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (degree < 0 || degree > 8)
      TypeCheckResult.TypeCheckFailure(s"series_fit_poly degree must be 0..8, got $degree")
    else if (children.forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"series_fit_poly expects double-array arguments, got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    def arr(e: Expression): Array[Double] = e.eval(input) match {
      case null => null
      case a: ArrayData =>
        val n = a.numElements()
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) return null
          out(i) = a.getDouble(i)
          i += 1
        }
        out
    }
    val y = arr(children.head)
    if (y == null || y.length == 0) return null
    val n = y.length
    val x = children.lift(1).map(arr).getOrElse(Array.tabulate(n)(_.toDouble))
    if (x == null || x.length != n) return null
    val d = math.min(degree, n - 1)
    val m = d + 1
    // normal equations: A_ij = Σ x^(i+j), b_i = Σ y·x^i
    val pows = new Array[Double](2 * d + 1)
    val b = new Array[Double](m)
    var k = 0
    while (k < n) {
      var p = 1.0
      var i = 0
      while (i <= 2 * d) {
        pows(i) += p
        if (i < m) b(i) += y(k) * p
        p *= x(k)
        i += 1
      }
      k += 1
    }
    val a = Array.tabulate(m, m)((i, j) => pows(i + j))
    // Gaussian elimination, partial pivoting
    val beta = new Array[Double](m)
    var col = 0
    var singular = false
    while (col < m && !singular) {
      var piv = col
      var r = col + 1
      while (r < m) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-12 * math.max(1.0, pows(2 * col))) singular = true
      else {
        if (piv != col) {
          val t = a(piv); a(piv) = a(col); a(col) = t
          val tb = b(piv); b(piv) = b(col); b(col) = tb
        }
        r = col + 1
        while (r < m) {
          val f = a(r)(col) / a(col)(col)
          var j = col
          while (j < m) { a(r)(j) -= f * a(col)(j); j += 1 }
          b(r) -= f * b(col)
          r += 1
        }
        col += 1
      }
    }
    if (singular) return null
    var i = m - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < m) { s -= a(i)(j) * beta(j); j += 1 }
      beta(i) = s / a(i)(i)
      i -= 1
    }
    val fit = new Array[Double](n)
    var sy = 0.0
    k = 0
    while (k < n) { sy += y(k); k += 1 }
    val mean = sy / n
    var ssTot = 0.0; var ssRes = 0.0
    k = 0
    while (k < n) {
      var f = 0.0
      var j = d
      while (j >= 0) { f = f * x(k) + beta(j); j -= 1 }
      fit(k) = f
      val e = y(k) - f
      ssRes += e * e
      val t = y(k) - mean
      ssTot += t * t
      k += 1
    }
    val rsquare = if (ssTot == 0.0) 1.0 else 1.0 - ssRes / ssTot
    val variance = if (n > 1) ssTot / (n - 1) else 0.0
    val rvariance = if (n > 1) ssRes / (n - 1) else 0.0
    val coefsHighFirst = beta.reverse
    InternalRow(rsquare, new GenericArrayData(coefsHighFirst), variance,
      rvariance, new GenericArrayData(fit))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFitPoly =
    copy(children = cs)
}
