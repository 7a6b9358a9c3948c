package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Discrete Fourier transform for `series_fft` / `series_ifft`.
  *
  * Power-of-2 lengths run iterative radix-2 Cooley-Tukey; every other
  * length runs Bluestein's chirp-z transform (the DFT as a convolution,
  * evaluated with three radix-2 FFTs at the next power of two ≥ 2n−1) —
  * so ANY series length is O(n log n), matching Kusto's any-length
  * series_fft. The chirp angle uses k² mod 2n to keep arguments small
  * (precision at large k). Inverse scales by 1/n (the convention that
  * makes ifft(fft(x)) = x exactly; FftSpec pins round-trip, naive-DFT
  * cross-check at non-power-of-2 lengths, known tone vectors, and
  * Parseval).
  *
  * Per-row work over a bounded series (the make-series axis), map-only,
  * zero shuffles — the same scale shape as the rest of the series rings. */
object Fft {

  private def fftRadix2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    if (n < 2) return
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len / 2
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + half); val vi0 = im(base + k + half)
          val vr = vr0 * cwr - vi0 * cwi
          val vi = vr0 * cwi + vi0 * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** DFT (inverse = conjugate-kernel, scaled by 1/n) of arbitrary length. */
  def dft(reIn: Array[Double], imIn: Array[Double], inverse: Boolean): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) return (Array.empty, Array.empty)
    if ((n & (n - 1)) == 0) {
      val re = reIn.clone(); val im = imIn.clone()
      fftRadix2(re, im, inverse)
      if (inverse) { var i = 0; while (i < n) { re(i) /= n; im(i) /= n; i += 1 } }
      (re, im)
    } else bluestein(reIn, imIn, inverse)
  }

  private def bluestein(x: Array[Double], y: Array[Double],
                        inverse: Boolean): (Array[Double], Array[Double]) = {
    val n = x.length
    val sign = if (inverse) 1.0 else -1.0
    val cr = new Array[Double](n); val ci = new Array[Double](n)
    var k = 0
    while (k < n) {
      val k2 = (k.toLong * k) % (2L * n)
      val ang = sign * math.Pi * k2 / n
      cr(k) = math.cos(ang); ci(k) = math.sin(ang)
      k += 1
    }
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    val br = new Array[Double](m); val bi = new Array[Double](m)
    k = 0
    while (k < n) {
      ar(k) = x(k) * cr(k) - y(k) * ci(k)
      ai(k) = x(k) * ci(k) + y(k) * cr(k)
      br(k) = cr(k); bi(k) = -ci(k)
      if (k > 0) { br(m - k) = cr(k); bi(m - k) = -ci(k) }
      k += 1
    }
    fftRadix2(ar, ai, inverse = false); fftRadix2(br, bi, inverse = false)
    k = 0
    while (k < m) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k)
      ar(k) = r
      k += 1
    }
    fftRadix2(ar, ai, inverse = true)
    val outR = new Array[Double](n); val outI = new Array[Double](n)
    k = 0
    while (k < n) {
      val rr = ar(k) / m; val ii = ai(k) / m
      outR(k) = rr * cr(k) - ii * ci(k)
      outI(k) = rr * ci(k) + ii * cr(k)
      k += 1
    }
    if (inverse) { k = 0; while (k < n) { outR(k) /= n; outI(k) /= n; k += 1 } }
    (outR, outI)
  }
}

/** `(re, im) = series_fft(x [, x_im])` / `series_ifft` — struct-returning
  * expression for the multi-assign extend form. Null input (or null
  * element) → null row value. CodegenFallback: the O(n log n) kernel
  * dominates the interpreted call overhead on any realistic series. */
case class SeriesFft(children: Seq[Expression], inverse: Boolean)
  extends Expression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("re", ArrayType(DoubleType, containsNull = false)),
    StructField("im", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"series_fft expects double-array arguments, got ${children.map(_.dataType.catalogString).mkString(", ")}")
  override def eval(input: InternalRow): Any = {
    def arr(e: Expression): Array[Double] = e.eval(input) match {
      case null => null
      case a: ArrayData =>
        val n = a.numElements()
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          if (a.isNullAt(i)) return null // null element → null result
          out(i) = a.getDouble(i)
          i += 1
        }
        out
    }
    val re = arr(children.head)
    if (re == null) return null
    val im = children.lift(1).map(arr).getOrElse(new Array[Double](re.length))
    if (im == null || im.length != re.length) return null
    val (or, oi) = Fft.dft(re, im, inverse)
    InternalRow(new GenericArrayData(or), new GenericArrayData(oi))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SeriesFft =
    copy(children = cs)
}
