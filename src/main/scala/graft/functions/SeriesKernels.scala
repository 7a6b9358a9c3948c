package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the series decomposition / gap-fill / IIR
  * scalars — `series_decompose(_anomalies/_forecast)`, `series_seasonal`,
  * `series_outliers`, `series_fill_forward/_backward/_linear`,
  * `series_iir`.
  *
  * The retired lowerings were HOF Column trees in [[SeriesDecompose]];
  * several were O(n²) per ROW (fill_forward/backward/linear re-scan the
  * prefix per element, iir re-appends the output array per step) on top
  * of the interpreted-lambda overhead. Each scalar is now one eval call
  * running O(n)–O(n·p) double loops — the shape a 100 TB make-series
  * pipeline needs, where these are the per-series hot loop.
  *
  * EXACTNESS CONTRACT (the [[SeriesFitOps]] stance): formulas mirror
  * the retired trees term by term — the interpolated percentile
  * `v_lo + (v_hi − v_lo)·(pos − lo)`, per-phase medians, the OLS trend
  * closed forms, Tukey-fence scores `(v − q)/IQR`, fill_linear's
  * `a + (b − a)·(i − li)/(ni − li)`, iir's
  * `(Σ b_j·x_{i−j} − Σ_{k≥1} a_k·y_{i−k}) / a_0` with zero-filled
  * out-of-range history — and the SeriesDecomposeSpec golden vectors
  * plus the q128/q129/q136/q138 DuckDB oracles pin them.
  *
  * Null stance (documented deviation from the retired trees' partial
  * null-poisoning, which no spec or gate pinned): a null SERIES is
  * null; a null ELEMENT in a decompose/seasonal/outliers/iir input is
  * null output (loudly — gap-fill FIRST, the documented make-series
  * usage); the fill family of course accepts null elements (that is
  * its job); forecast accepts nulls in the FORECAST TAIL (the axis
  * filler slots) but not the training prefix. `series_decompose`'s
  * period −1 (Kusto autodetect) stays a loud per-row error. */
object SeriesKernelOps {

  /** Interpolated percentile over a SORTED array — pctSorted verbatim. */
  def pct(s: Array[Double], p: Double): Double = {
    val m = s.length
    val pos = (m - 1).toDouble * p
    val lo = Math.floor(pos).toInt
    val vlo = s(lo)
    val vhi = s(Math.ceil(pos).toInt)
    vlo + (vhi - vlo) * (pos - lo.toDouble)
  }

  private def median(vals: Array[Double]): Double = {
    val s = vals.clone()
    java.util.Arrays.sort(s)
    pct(s, 0.5)
  }

  def autodetectError(): Nothing = throw new RuntimeException(
    "series_decompose: period autodetect (-1) is not supported — pass an explicit period")

  /** Per-phase-median seasonal component over xs[0, n), tiled to
    * length `outLen` (== n for decompose; the full axis for forecast,
    * reading phase i mod p of the TRAINING seasonal — identical values
    * because the seasonal is itself p-periodic). p must be ≥ 0; a phase
    * with no observations (p > n) → null (loudly — no component). */
  def seasonal(xs: Array[Double], p: Int, outLen: Int): Array[Double] = {
    val out = new Array[Double](outLen)
    if (p <= 0) return out // zeros
    val meds = new Array[Double](p)
    val buf = new Array[Double](xs.length / p + 1)
    var ph = 0
    while (ph < p) {
      var k = 0
      var i = ph
      while (i < xs.length) { buf(k) = xs(i); k += 1; i += p }
      if (k == 0) return null
      meds(ph) = median(java.util.Arrays.copyOf(buf, k))
      ph += 1
    }
    var i = 0
    while (i < outLen) { out(i) = meds(i % p); i += 1 }
    out
  }

  /** Trend over the de-seasonalized series: 'none' zeros, 'avg' the
    * constant mean, 'linefit' the OLS line vs the 0-based index (the
    * fitLine slope/intercept closed forms verbatim). */
  def trend(d: Array[Double], kind: String): Array[Double] = {
    val n = d.length
    val out = new Array[Double](n)
    kind match {
      case "none" => out
      case "avg" =>
        var sy = 0.0
        var i = 0
        while (i < n) { sy += d(i); i += 1 }
        val m = sy / n.toDouble
        i = 0
        while (i < n) { out(i) = m; i += 1 }
        out
      case "linefit" =>
        val nD = n.toDouble
        var sy = 0.0; var sxy = 0.0
        var i = 0
        while (i < n) { sy += d(i); sxy += i.toDouble * d(i); i += 1 }
        val sx = nD * (nD - 1.0) / 2.0
        val sxx = nD * (nD - 1.0) * (2.0 * nD - 1.0) / 6.0
        val denom = nD * sxx - sx * sx
        val slope = if (denom != 0.0) (nD * sxy - sx * sy) / denom else 0.0
        val icept = if (n > 0) (sy - slope * sx) / nD else 0.0
        i = 0
        while (i < n) { out(i) = icept + slope * i.toDouble; i += 1 }
        out
      case other => throw new IllegalArgumentException(
        s"series_decompose: trend must be 'linefit', 'avg' or 'none', got '$other'")
    }
  }

  /** Tukey-fence outlier scores: distance beyond the nearest quantile
    * in IQR units; 0 inside, 0 when IQR == 0. */
  def outlierScores(resid: Array[Double], pLo: Double, pHi: Double): Array[Double] = {
    val n = resid.length
    val out = new Array[Double](n)
    if (n == 0) return out
    val s = resid.clone()
    java.util.Arrays.sort(s)
    val ql = pct(s, pLo); val qh = pct(s, pHi)
    val iqr = qh - ql
    if (iqr == 0.0) return out
    var i = 0
    while (i < n) {
      val v = resid(i)
      out(i) = if (v > qh) (v - qh) / iqr else if (v < ql) (v - ql) / iqr else 0.0
      i += 1
    }
    out
  }
}

/** Shared plumbing for the array-in kernels. */
abstract class SeriesKernelExpr extends Expression with CodegenFallback {
  override def nullable: Boolean = true
  protected def requireDoubleArray(fn: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn expects a double-array argument, got ${other.catalogString}")
    }
  /** null series or null element → null (the loudly-null stance). */
  protected def strictDoubles(v: Any): Array[Double] = v match {
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
  /** null series → null; elements may be null (the fill family). */
  protected def boxedDoubles(v: Any): Array[java.lang.Double] = v match {
    case null => null
    case a: ArrayData =>
      val n = a.numElements()
      val out = new Array[java.lang.Double](n)
      var i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i))
        i += 1
      }
      out
  }
  protected def intOf(v: Any): java.lang.Integer = v match {
    case null => null
    case i: java.lang.Integer => i
    case n: java.lang.Number => java.lang.Integer.valueOf(n.intValue())
  }
  protected def dblOf(v: Any): java.lang.Double = v match {
    case null => null
    case d: java.lang.Double => d
    case n: java.lang.Number => java.lang.Double.valueOf(n.doubleValue())
  }
  protected def arr(xs: Array[Double]): GenericArrayData =
    new GenericArrayData(xs.map(_.asInstanceOf[Any]))
}

/** `mode` ∈ decompose | anomalies | forecast | seasonal.
  * Children: decompose/seasonal (series, period); anomalies (series,
  * threshold, period); forecast (series, points, period). Output:
  * decompose/forecast → array<struct<base, seas, tr, resid>> (resid
  * null on the forecast tail); anomalies → array<struct<flag, score,
  * base>> (ctukey 10/90 fences, |score| ≥ threshold flags ±1);
  * seasonal → array<double>. */
case class SeriesDecomposeKernel(children: Seq[Expression], trendKind: String, mode: String)
  extends SeriesKernelExpr {
  private val component = StructType(Seq(
    StructField("base", DoubleType), StructField("seas", DoubleType),
    StructField("tr", DoubleType), StructField("resid", DoubleType)))
  override def dataType: DataType = mode match {
    case "seasonal" => ArrayType(DoubleType, containsNull = false)
    case "anomalies" => ArrayType(StructType(Seq(
      StructField("flag", LongType), StructField("score", DoubleType),
      StructField("base", DoubleType))), containsNull = false)
    case _ => ArrayType(component, containsNull = false)
  }
  override def checkInputDataTypes(): TypeCheckResult =
    requireDoubleArray(s"series_$mode", children.head)

  /** (seasFull, trFull) on [0, outLen) from the training prefix. */
  private def components(train: Array[Double], p: Int, outLen: Int):
      (Array[Double], Array[Double]) = {
    val seasT = SeriesKernelOps.seasonal(train, p, train.length)
    if (seasT == null) return null // empty phase (p > n)
    val d = new Array[Double](train.length)
    var i = 0
    while (i < train.length) { d(i) = train(i) - seasT(i); i += 1 }
    val trT = SeriesKernelOps.trend(d, trendKind)
    if (outLen == train.length) {
      val seasFull = if (p > 0) seasT else new Array[Double](outLen)
      (seasFull, trT)
    } else {
      // forecast extension: seasonal tiles the training phase values;
      // trend is affine in the index — recover (t1, slope) and extend
      val seasFull = new Array[Double](outLen)
      if (p > 0) { // p ≤ ntrain here (seasonal nulled the empty-phase case)
        i = 0
        while (i < outLen) { seasFull(i) = seasT(i % p); i += 1 }
      }
      val trFull = new Array[Double](outLen)
      if (train.length >= 1) {
        val t1 = trT(0)
        val slope = if (train.length >= 2) trT(1) - t1 else 0.0
        i = 0
        while (i < outLen) { trFull(i) = t1 + slope * i.toDouble; i += 1 }
      }
      (seasFull, trFull)
    }
  }

  override def eval(input: InternalRow): Any = {
    val raw = children.head.eval(input)
    if (raw == null) return null
    mode match {
      case "seasonal" =>
        val xs = strictDoubles(raw)
        val p = intOf(children(1).eval(input))
        if (p == null) return null
        if (p.intValue() < 0) SeriesKernelOps.autodetectError()
        if (xs == null) return null
        val seas = SeriesKernelOps.seasonal(xs, p.intValue(), xs.length)
        if (seas == null) return null
        arr(seas)
      case "decompose" | "anomalies" =>
        val xs = strictDoubles(raw)
        val pIdx = if (mode == "anomalies") 2 else 1
        val p = intOf(children(pIdx).eval(input))
        if (p == null) return null
        if (p.intValue() < 0) SeriesKernelOps.autodetectError()
        if (xs == null) return null
        val comps = components(xs, p.intValue(), xs.length)
        if (comps == null) return null
        val (seas, tr) = comps
        val n = xs.length
        if (mode == "decompose") {
          val rows = new Array[Any](n)
          var i = 0
          while (i < n) {
            val base = seas(i) + tr(i)
            rows(i) = InternalRow(base, seas(i), tr(i), xs(i) - base)
            i += 1
          }
          new GenericArrayData(rows)
        } else {
          val th = dblOf(children(1).eval(input))
          val resid = new Array[Double](n)
          var i = 0
          while (i < n) { resid(i) = xs(i) - (seas(i) + tr(i)); i += 1 }
          val score = SeriesKernelOps.outlierScores(resid, 0.10, 0.90)
          val rows = new Array[Any](n)
          i = 0
          while (i < n) {
            val sc = score(i)
            val flag: Long =
              if (th != null && sc >= th.doubleValue()) 1L
              else if (th != null && sc <= -th.doubleValue()) -1L
              else 0L
            rows(i) = InternalRow(flag, sc, seas(i) + tr(i))
            i += 1
          }
          new GenericArrayData(rows)
        }
      case "forecast" =>
        val xs = boxedDoubles(raw)
        val points = intOf(children(1).eval(input))
        val p = intOf(children(2).eval(input))
        if (points == null || p == null) return null
        if (p.intValue() < 0) SeriesKernelOps.autodetectError()
        val n = xs.length
        val ntrain = n - points.intValue()
        if (ntrain <= 0) return null
        val train = new Array[Double](ntrain)
        var i = 0
        while (i < ntrain) {
          if (xs(i) == null) return null // training prefix must be gap-free
          train(i) = xs(i).doubleValue()
          i += 1
        }
        val comps = components(train, p.intValue(), n)
        if (comps == null) return null
        val (seas, tr) = comps
        val rows = new Array[Any](n)
        i = 0
        while (i < n) {
          val base = seas(i) + tr(i)
          val resid: Any =
            if (i < ntrain) train(i) - base
            else null // the forecast tail carries no observation
          rows(i) = InternalRow(base, seas(i), tr(i), resid)
          i += 1
        }
        new GenericArrayData(rows)
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesDecomposeKernel =
    copy(children = cs)
}

/** `series_outliers(x [, kind])` — Tukey-fence scores at the given
  * quantile pair (ctukey 10/90, tukey 25/75). */
case class SeriesOutliersKernel(child: Expression, pLo: Double, pHi: Double)
  extends SeriesKernelExpr {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    requireDoubleArray("series_outliers", child)
  override def eval(input: InternalRow): Any = {
    val xs = strictDoubles(child.eval(input))
    if (xs == null) return null
    arr(SeriesKernelOps.outlierScores(xs, pLo, pHi))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesOutliersKernel =
    copy(child = cs.head)
}

/** `mode` ∈ forward | backward | linear — the make-series gap fills.
  * Null elements are the INPUT contract here; pinned edge rules:
  * fill_forward leaves leading nulls, fill_backward trailing nulls,
  * fill_linear interpolates `a + (b − a)·(i − li)/(ni − li)` between
  * the nearest non-null neighbors, nearest-only at the edges, all-null
  * stays all-null. One O(n) pass each. */
case class SeriesFillKernel(child: Expression, mode: String)
  extends SeriesKernelExpr {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult =
    requireDoubleArray(s"series_fill_$mode", child)
  override def eval(input: InternalRow): Any = {
    val xs = boxedDoubles(child.eval(input))
    if (xs == null) return null
    val n = xs.length
    val out = new Array[Any](n)
    mode match {
      case "forward" =>
        var last: java.lang.Double = null
        var i = 0
        while (i < n) {
          if (xs(i) != null) last = xs(i)
          out(i) = last
          i += 1
        }
      case "backward" =>
        var nxt: java.lang.Double = null
        var i = n - 1
        while (i >= 0) {
          if (xs(i) != null) nxt = xs(i)
          out(i) = nxt
          i -= 1
        }
      case "linear" =>
        // prev/next non-null index per position, two O(n) sweeps
        val li = new Array[Int](n); val ni = new Array[Int](n)
        var last = -1
        var i = 0
        while (i < n) { if (xs(i) != null) last = i; li(i) = last; i += 1 }
        last = -1
        i = n - 1
        while (i >= 0) { if (xs(i) != null) last = i; ni(i) = last; i -= 1 }
        i = 0
        while (i < n) {
          out(i) =
            if (xs(i) != null) xs(i)
            else if (li(i) == -1 && ni(i) == -1) null
            else if (li(i) == -1) xs(ni(i))
            else if (ni(i) == -1) xs(li(i))
            else {
              val a = xs(li(i)).doubleValue(); val b = xs(ni(i)).doubleValue()
              java.lang.Double.valueOf(
                a + (b - a) * (i - li(i)).toDouble / (ni(i) - li(i)).toDouble)
            }
          i += 1
        }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFillKernel =
    copy(child = cs.head)
}

/** `series_fir(x, filter [, normalize])` — y[i] = Σ_j x_{i−j}·f_j,
  * zero-filled out-of-range history; `normalize` (default: true iff
  * every coefficient is non-negative, Kusto's rule) divides the filter
  * by its sum first (skipped when the sum is 0). O(n·k) per row. */
case class SeriesFirKernel(first: Expression, second: Expression, third: Expression)
  extends SeriesKernelExpr {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val arrays = Seq(first, second).map(requireDoubleArray("series_fir", _))
    arrays.find(_ != TypeCheckResult.TypeCheckSuccess).getOrElse(
      third.dataType match {
        case BooleanType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"series_fir normalize must be BOOLEAN, got ${other.catalogString}")
      })
  }
  override def eval(input: InternalRow): Any = {
    val x = strictDoubles(first.eval(input))
    val f0 = strictDoubles(second.eval(input))
    if (x == null || f0 == null) return null
    val normalize = third.eval(input) match {
      case b: java.lang.Boolean => b.booleanValue()
      case _ => false // null normalize: the un-normalized arm
    }
    var fsum = 0.0
    var j = 0
    while (j < f0.length) { fsum += f0(j); j += 1 }
    val f = if (normalize && fsum != 0.0) f0.map(_ / fsum) else f0
    val n = x.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      j = 0
      while (j < f.length) {
        s += (if (i - j >= 0) x(i - j) else 0.0) * f(j)
        j += 1
      }
      y(i) = s
      i += 1
    }
    arr(y)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFirKernel =
    copy(first = cs(0), second = cs(1), third = cs(2))
}

/** `series_iir(x, b, a)` — y[i] = (Σ_j b_j·x_{i−j} − Σ_{k≥1}
  * a_k·y_{i−k}) / a_0, zero-filled out-of-range history. O(n·(|a|+|b|))
  * per row (the retired fold additionally re-appended the output array
  * per step — O(n²) allocation). Empty-x → empty; empty a → null
  * (loudly — the retired tree threw). */
case class SeriesIirKernel(first: Expression, second: Expression, third: Expression)
  extends SeriesKernelExpr {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val checks = children.map(requireDoubleArray("series_iir", _))
    checks.find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
  override def eval(input: InternalRow): Any = {
    val x = strictDoubles(first.eval(input))
    val b = strictDoubles(second.eval(input))
    val a = strictDoubles(third.eval(input))
    if (x == null || b == null || a == null) return null
    if (x.length == 0) return new GenericArrayData(Array.empty[Any])
    if (a.length == 0) return null
    val n = x.length
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      var bsum = 0.0
      var j = 0
      while (j < b.length) {
        bsum += b(j) * (if (i - j >= 0) x(i - j) else 0.0)
        j += 1
      }
      var asum = 0.0
      var k = 1
      while (k < a.length) {
        asum += a(k) * (if (i - k >= 0) y(i - k) else 0.0)
        k += 1
      }
      y(i) = (bsum - asum) / a(0)
      i += 1
    }
    arr(y)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesIirKernel =
    copy(first = cs(0), second = cs(1), third = cs(2))
}
