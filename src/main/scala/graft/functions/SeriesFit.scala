package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the series-fit / period-detection scalars —
  * `series_fit_line(_dynamic)`, `series_fit_2lines(_dynamic)`,
  * `series_periods_detect`, `series_periods_validate`.
  *
  * These were HOF Column trees in [[SeriesDecompose]] (interpreted
  * lambda folds per row; the 2-lines changepoint scan additionally paid
  * an O(n²) prefix-array construction). Each is now ONE eval call per
  * row running tight double loops — same shape as [[SeriesFitPoly]],
  * whose CodegenFallback stance applies: the fit dominates the
  * interpreted call overhead.
  *
  * EXACTNESS CONTRACT: formulas mirror the retired Column lowerings
  * term by term in IEEE op order — the closed-form Σi/Σi² triangles,
  * `RSS = Syy − b̂·Sy − m̂·Sxy`, `SStot = Syy − Sy²/n`, left-to-right
  * folds — because the q135/q137/q234 DuckDB oracles restate exactly
  * these sums (round(,6) gates sit far above ulp, but the order is
  * kept anyway). Null edges are also mirrored: a null ELEMENT poisons
  * the sums the way a null fold does (fit_line keeps its `slope=0.0
  * when denom==0` quirk, 2-lines falls to the all-null row, periods
  * score 0.0); a null series reproduces the retired trees' field-level
  * null patterns — see each eval. The detector ranks by acf ROUNDED TO
  * 9 DECIMALS (HALF_UP BigDecimal — Spark's round()) desc then lag asc,
  * pinning cross-engine rank order against last-ulp summation noise.
  */
object SeriesFitOps {

  /** (rsquare, slope, variance, rvariance, interception, line_fit). */
  final class LineFit(
    val rsquare: java.lang.Double, val slope: java.lang.Double,
    val variance: java.lang.Double, val rvariance: java.lang.Double,
    val interception: java.lang.Double, val lineFit: Array[Any])

  /** OLS vs the 0-based index over xs[from, until). `localX`: x runs
    * 0..len−1 relative to `from` (the _dynamic sub-line form). A null
    * element anywhere in the RANGE poisons exactly like the fold did. */
  def fitLine(xs: Array[java.lang.Double], from: Int, until: Int): LineFit = {
    val n = until - from
    val nD = n.toDouble
    var hasNull = false
    var i = from
    while (i < until) { if (xs(i) == null) hasNull = true; i += 1 }
    val sx = nD * (nD - 1.0) / 2.0
    val sxx = nD * (nD - 1.0) * (2.0 * nD - 1.0) / 6.0
    val denom = nD * sxx - sx * sx
    if (hasNull) {
      // null sums: slope keeps the denom==0 → 0.0 arm, icept the n>0
      // guard; everything else nulls; line_fit = n nulls
      val slope: java.lang.Double = if (denom != 0.0) null else java.lang.Double.valueOf(0.0)
      val icept: java.lang.Double = if (n > 0) null else java.lang.Double.valueOf(0.0)
      return new LineFit(null, slope, null, null, icept, new Array[Any](n))
    }
    var sy = 0.0; var syy = 0.0; var sxy = 0.0
    i = from
    var k = 0
    while (i < until) {
      val x = xs(i).doubleValue()
      sy += x
      syy += x * x
      sxy += k.toDouble * x
      i += 1; k += 1
    }
    val slope = if (denom != 0.0) (nD * sxy - sx * sy) / denom else 0.0
    val icept = if (n > 0) (sy - slope * sx) / nD else 0.0
    var ssres = 0.0
    i = from; k = 0
    while (i < until) {
      val e = xs(i).doubleValue() - (icept + slope * k.toDouble)
      ssres += e * e
      i += 1; k += 1
    }
    val sstot = syy - sy * sy / nD
    val rsquare = if (sstot == 0.0) 1.0 else 1.0 - ssres / sstot
    val fit = new Array[Any](n)
    k = 0
    while (k < n) { fit(k) = icept + slope * k.toDouble; k += 1 }
    new LineFit(rsquare, slope, sstot / (nD - 1.0), ssres / (nD - 1.0), icept, fit)
  }

  private def tri(k: Int): Double = k.toDouble * (k + 1).toDouble / 2.0
  private def pyr(k: Int): Double =
    k.toDouble * (k + 1).toDouble * (2.0 * k.toDouble + 1.0) / 6.0

  /** (slopeM, iceptB, rss) for the GLOBAL-index OLS over [a, b) from
    * the prefix sums — the retired seg() helper verbatim. */
  private def seg(psy: Array[Double], psyy: Array[Double], psxy: Array[Double],
                  a: Int, b: Int, out: Array[Double]): Unit = {
    val m = (b - a).toDouble
    val sx = tri(b - 1) - tri(a - 1)
    val sxx = pyr(b - 1) - pyr(a - 1)
    val sy = psy(b) - psy(a)
    val syy = psyy(b) - psyy(a)
    val sxy = psxy(b) - psxy(a)
    val denom = m * sxx - sx * sx
    val slope = if (denom != 0.0) (m * sxy - sx * sy) / denom else 0.0
    val icept = (sy - slope * sx) / m
    out(0) = slope; out(1) = icept; out(2) = syy - icept * sy - slope * sxy
  }

  /** Best single-changepoint split: (split, rss, lm, lb, rm, rb) or
    * null for short/null-poisoned series. Split ranges [2, n−2], ties
    * keep the smallest. */
  def fit2Lines(xs: Array[java.lang.Double]): Array[Double] = {
    val n = xs.length
    if (n < 4) return null
    var i = 0
    while (i < n) { if (xs(i) == null) return null; i += 1 }
    val psy = new Array[Double](n + 1)
    val psyy = new Array[Double](n + 1)
    val psxy = new Array[Double](n + 1)
    i = 0
    while (i < n) {
      val x = xs(i).doubleValue()
      psy(i + 1) = psy(i) + x
      psyy(i + 1) = psyy(i) + x * x
      psxy(i + 1) = psxy(i) + i.toDouble * x
      i += 1
    }
    val l = new Array[Double](3); val r = new Array[Double](3)
    var bestRss = Double.MaxValue; var bestS = -1
    var s = 2
    while (s <= n - 2) {
      seg(psy, psyy, psxy, 0, s, l)
      seg(psy, psyy, psxy, s, n, r)
      val tot = l(2) + r(2)
      if (tot < bestRss) { bestRss = tot; bestS = s }
      s += 1
    }
    if (bestS == -1) return null
    seg(psy, psyy, psxy, 0, bestS, l)
    seg(psy, psyy, psxy, bestS, n, r)
    Array(bestS.toDouble, bestRss, l(0), l(1), r(0), r(1))
  }

  def round9(v: Double): Double =
    java.math.BigDecimal.valueOf(v).setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** struct<rsquare, slope, variance, rvariance, interception, line_fit>
  * — Kusto's series_fit_line output order (sample variances, rsquare
  * pinned 1.0 for constant series). */
case class SeriesFitLine(child: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("rsquare", DoubleType),
    StructField("slope", DoubleType),
    StructField("variance", DoubleType),
    StructField("rvariance", DoubleType),
    StructField("interception", DoubleType),
    StructField("line_fit", ArrayType(DoubleType, containsNull = true))))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"series_fit_line expects a double-array argument, got ${other.catalogString}")
  }
  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null =>
      // the retired tree's null-series pattern: guards collapse to
      // their 0.0 arms, sums null out, line_fit nulls out wholesale
      InternalRow(null, 0.0, null, null, 0.0, null)
    case a: ArrayData =>
      val n = a.numElements()
      val xs = new Array[java.lang.Double](n)
      var i = 0
      while (i < n) {
        xs(i) = if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))
        i += 1
      }
      val f = SeriesFitOps.fitLine(xs, 0, n)
      InternalRow(f.rsquare, f.slope, f.variance, f.rvariance, f.interception,
        new GenericArrayData(f.lineFit))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFitLine =
    copy(child = cs.head)
}

/** struct<rsquare, split_idx, variance, rvariance, line_fit [, left,
  * right]> — best two-segment OLS changepoint (split minimizes RSS,
  * ties → smallest, both segments ≥ 2 points; series shorter than 4 or
  * null-poisoned → all-null row). `dynamic=true` appends the LOCAL-x
  * per-segment line summaries (the series_fit_2lines_dynamic sub-bags,
  * line_fit dropped). */
case class SeriesFit2Lines(child: Expression, dynamic: Boolean)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  private val subLine = StructType(Seq(
    StructField("rsquare", DoubleType),
    StructField("slope", DoubleType),
    StructField("variance", DoubleType),
    StructField("rvariance", DoubleType),
    StructField("interception", DoubleType)))
  override def dataType: DataType = {
    val base = Seq(
      StructField("rsquare", DoubleType),
      StructField("split_idx", LongType),
      StructField("variance", DoubleType),
      StructField("rvariance", DoubleType),
      StructField("line_fit", ArrayType(DoubleType, containsNull = true)))
    StructType(if (dynamic) base ++ Seq(
      StructField("left", subLine), StructField("right", subLine)) else base)
  }
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"series_fit_2lines expects a double-array argument, got ${other.catalogString}")
  }
  private def nullRow: InternalRow =
    if (dynamic) InternalRow(null, null, null, null, null, null, null)
    else InternalRow(null, null, null, null, null)
  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => nullRow
    case a: ArrayData =>
      val n = a.numElements()
      val xs = new Array[java.lang.Double](n)
      var i = 0
      while (i < n) {
        xs(i) = if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))
        i += 1
      }
      val w = SeriesFitOps.fit2Lines(xs)
      if (w == null) return nullRow
      val s = w(0).toInt; val rss = w(1)
      val lm = w(2); val lb = w(3); val rm = w(4); val rb = w(5)
      var sy = 0.0; var syy = 0.0
      i = 0
      while (i < n) {
        val x = xs(i).doubleValue(); sy += x; syy += x * x; i += 1
      }
      val nD = n.toDouble
      val sstot = syy - sy * sy / nD
      val rsquare = if (sstot == 0.0) 1.0 else 1.0 - rss / sstot
      val fit = new Array[Any](n)
      i = 0
      while (i < n) {
        val x = i.toDouble
        fit(i) = if (i < s) lb + lm * x else rb + rm * x
        i += 1
      }
      val base = Seq[Any](rsquare, s.toLong, sstot / (nD - 1.0), rss / (nD - 1.0),
        new GenericArrayData(fit))
      if (!dynamic) InternalRow(base: _*)
      else {
        def sub(from: Int, until: Int): InternalRow = {
          val f = SeriesFitOps.fitLine(xs, from, until)
          InternalRow(f.rsquare, f.slope, f.variance, f.rvariance, f.interception)
        }
        InternalRow(base ++ Seq[Any](sub(0, s), sub(s, n)): _*)
      }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFit2Lines =
    copy(child = cs.head)
}

/** struct<periods array<double>, scores array<double>> for BOTH period
  * scalars. `detect=true` → (series, minP, maxP, num): ACF-ranked lags
  * in [max(2,minP), min(maxP,n−1)], acf > 0 only, rank by round(acf,9)
  * desc then lag asc, top num. `detect=false` → (series, lag1, …,
  * lagN): scores the GIVEN lags (out-of-range/constant → 0.0, the
  * detector's "nothing detected" stance), periods echo as doubles. */
case class SeriesPeriods(children: Seq[Expression], detect: Boolean)
  extends Expression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("periods", ArrayType(DoubleType, containsNull = true)),
    StructField("scores", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = children.head.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"series_periods expects a double-array series, got ${other.catalogString}")
  }

  /** Mean-centered series + Σc² denominator; null series / null element
    * → null (the poisoned-fold analog). */
  private def centered(input: InternalRow): (Array[Double], Double) =
    children.head.eval(input) match {
      case null => null
      case a: ArrayData =>
        val n = a.numElements()
        val xs = new Array[Double](n)
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) return null
          xs(i) = a.getDouble(i)
          i += 1
        }
        var sy = 0.0
        i = 0
        while (i < n) { sy += xs(i); i += 1 }
        val mu = sy / n.toDouble
        val c = new Array[Double](n)
        var d = 0.0
        i = 0
        while (i < n) { c(i) = xs(i) - mu; d += c(i) * c(i); i += 1 }
        (c, d)
    }

  private def acf(c: Array[Double], d: Double, l: Int): Double = {
    var s = 0.0
    var i = 0
    val hi = c.length - 1 - l
    while (i <= hi) { s += c(i) * c(i + l); i += 1 }
    s / d
  }

  override def eval(input: InternalRow): Any = {
    val cd = centered(input)
    if (detect) {
      // null series → null fields (the retired tree's sequence(null)
      // propagation); a null-POISONED series detects nothing (empty)
      if (cd == null && children.head.eval(input) == null)
        return InternalRow(null, null)
      def intArg(i: Int): java.lang.Integer = children(i).eval(input) match {
        case null => null
        case v: java.lang.Integer => v
        case v: java.lang.Number => java.lang.Integer.valueOf(v.intValue())
      }
      val num = intArg(3)
      if (num == null) return InternalRow(null, null)
      val n = if (cd == null) 0 else cd._1.length
      val minP = intArg(1); val maxP = intArg(2)
      val lo = if (minP == null) 2 else Math.max(2, minP.intValue())
      val hi0 = n - 1
      val hi = if (maxP == null) hi0 else Math.min(maxP.intValue(), hi0)
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
      if (cd != null && cd._2 != 0.0) {
        var l = lo
        while (l <= hi) {
          val a = acf(cd._1, cd._2, l)
          if (a > 0) cands += ((a, l))
          l += 1
        }
      }
      val ranked = cands.sortWith { case ((ax0, lx), (ay0, ly)) =>
        val ax = SeriesFitOps.round9(ax0); val ay = SeriesFitOps.round9(ay0)
        if (ax != ay) ax > ay else lx < ly
      }.take(Math.max(0, num.intValue()))
      InternalRow(
        new GenericArrayData(ranked.map(_._2.toDouble: Any).toArray),
        new GenericArrayData(ranked.map(_._1: Any).toArray))
    } else {
      // validate: periods echo the given lags (null lag → null period),
      // scores = max(0, acf) for in-range lags on a non-constant,
      // non-poisoned series, else 0.0
      val n = if (cd == null) 0 else cd._1.length
      val lags = children.tail
      val periods = new Array[Any](lags.length)
      val scores = new Array[Any](lags.length)
      var i = 0
      while (i < lags.length) {
        val lv = lags(i).eval(input)
        val l: java.lang.Integer = lv match {
          case null => null
          case v: java.lang.Integer => v
          case v: java.lang.Number => java.lang.Integer.valueOf(v.intValue())
        }
        periods(i) = if (l == null) null else l.doubleValue()
        scores(i) =
          if (cd == null || cd._2 == 0.0 || l == null ||
              l.intValue() < 2 || l.intValue() > n - 1) 0.0
          else Math.max(0.0, acf(cd._1, cd._2, l.intValue()))
        i += 1
      }
      InternalRow(new GenericArrayData(periods), new GenericArrayData(scores))
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesPeriods =
    copy(children = cs)
}
