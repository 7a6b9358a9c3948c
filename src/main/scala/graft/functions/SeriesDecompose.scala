package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Series decomposition / anomaly scoring over `make-series` arrays — the
  * KQL `series_decompose` / `series_decompose_anomalies` / `series_outliers`
  * surface (the production anomaly stack above `make-series`; reference
  * context: the Grafana dashboards shipped with the connector,
  * docker-quickstart/grafana/dashboards/kafka-connect-metrics.json).
  *
  * Everything here is map-only over one array cell: zero shuffle, bounded
  * by the make-series axis length (≤1e6 bins by the compiler's axis cap) —
  * so a 100 TB events table decomposes in the same single pass that built
  * the series. The decompose/fill/iir component math runs in the native
  * kernels of [[SeriesKernelOps]] (one eval call per row; the retired HOF
  * Column trees walked interpreted lambdas, O(n²) for the fills/iir); this
  * object keeps the public Column API and the small fold scalars
  * (dot/magnitude/cosine, fill_const) that are cheap as lambdas.
  *
  * Pinned semantics (documented here because Kusto's internals are not
  * public; the DuckDB oracle replicates exactly this spec):
  *
  *  - percentile: linear interpolation over the sorted array at rank
  *    p·(n-1) (the standard "C = 1" estimator, identical to DuckDB's
  *    `quantile_cont` and numpy's default).
  *  - seasonal component (period p > 0): per-phase medians — element i
  *    gets the median of all elements whose index ≡ i (mod p). p == 0
  *    means no seasonality (zeros). p < 0 (Kusto's autodetect) is a loud
  *    runtime error: pass an explicit period.
  *  - trend: 'linefit' = ordinary least squares over the de-seasonalized
  *    series vs the bin index (Kusto's default); 'avg' = constant mean;
  *    'none' = zeros.
  *  - baseline = seasonal + trend; residual = input − baseline.
  *  - outlier score (Tukey fences): distance beyond the nearest quantile
  *    in IQR units — (x−q_hi)/IQR above, (x−q_lo)/IQR below, 0 inside,
  *    0 when IQR == 0. Default quantiles are Kusto's 'ctukey' 10/90;
  *    'tukey' uses 25/75. |score| ≥ 1.5 is the conventional mild-anomaly
  *    fence, ≥ 3.0 strong.
  *  - anomaly flag: sign(score) where |score| ≥ threshold, else 0.
  */
object SeriesDecompose {

  /** Input normalization: everything computes in doubles. */
  private def dbl(a: Column): Column = transform(a, _.cast("double"))

  private def kernel(children: Seq[Column], trendKind: String, mode: String): Column =
    GraftColumnBridge.column(SeriesDecomposeKernel(
      children.map(GraftColumnBridge.catalystExpression), trendKind, mode))

  /** Public `series_seasonal(x, period)` surface: the per-phase-median
    * component decompose uses, computed standalone. */
  def seasonal(series: Column, period: Column): Column =
    kernel(Seq(dbl(series), period.cast("int")), "none", "seasonal")

  /** `series_iir(x, b, a)` — recursive (infinite-impulse-response)
    * filter, Kusto semantics: y[i] = (Σ_j b[j]·x[i−j] − Σ_{k≥1}
    * a[k]·y[i−k]) / a[0]; out-of-range history reads 0. */
  def iir(series: Column, bCoef: Column, aCoef: Column): Column =
    GraftColumnBridge.column(SeriesIirKernel(
      GraftColumnBridge.catalystExpression(dbl(series)),
      GraftColumnBridge.catalystExpression(dbl(bCoef)),
      GraftColumnBridge.catalystExpression(dbl(aCoef))))

  /** Sequential IEEE left-fold dot product of two equal-length series
    * (the q25 determinism technique); scalar second operand multiplies
    * elementwise against the sum. */
  def dotProduct(aS: Column, bS: Column): Column =
    aggregate(zip_with(dbl(aS), dbl(bS), (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def magnitude(s: Column): Column =
    sqrt(aggregate(dbl(s), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either magnitude is zero (pinned —
    * deterministic where the 0/0 form is undefined). The denominator
    * binds once through a single-element transform so it is evaluated
    * once per row. */
  def cosineSimilarity(aS: Column, bS: Column): Column =
    element_at(transform(array(magnitude(aS) * magnitude(bS)), denom =>
      when(denom === 0.0, lit(0.0)).otherwise(dotProduct(aS, bS) / denom)), 1)

  /** One array<struct<base, seas, tr, resid>> column — Kusto's component
    * order is (baseline, seasonal, trend, residual); the compiler
    * materializes this once and extracts fields per assigned name. */
  def decomposeStruct(series: Column, period: Column, trendKind: String): Column =
    kernel(Seq(dbl(series), period.cast("int")), trendKind, "decompose")

  /** Tukey-fence outlier scores; quantiles (pLo, pHi) per the pinned spec. */
  def outliers(series: Column, pLo: Double, pHi: Double): Column =
    GraftColumnBridge.column(SeriesOutliersKernel(
      GraftColumnBridge.catalystExpression(dbl(series)), pLo, pHi))

  /** Gap-filling family over make-series arrays with null gaps (the
    * no-`default` make-series form). Pinned edge rules: fill_forward
    * leaves leading nulls (no prior value), fill_backward leaves
    * trailing nulls, fill_linear uses the nearest non-null when only
    * one side exists and leaves all-null series null. */
  def fillConst(series: Column, v: Column): Column =
    transform(dbl(series), x => coalesce(x, v.cast("double")))

  def fillForward(series: Column): Column =
    GraftColumnBridge.column(SeriesFillKernel(
      GraftColumnBridge.catalystExpression(dbl(series)), "forward"))

  def fillBackward(series: Column): Column =
    GraftColumnBridge.column(SeriesFillKernel(
      GraftColumnBridge.catalystExpression(dbl(series)), "backward"))

  def fillLinear(series: Column): Column =
    GraftColumnBridge.column(SeriesFillKernel(
      GraftColumnBridge.catalystExpression(dbl(series)), "linear"))

  /** series_decompose_forecast: the input series carries `points`
    * trailing slots to forecast (the make-series axis extends past the
    * data, Kusto's documented usage). Components are FIT ON THE TRAINING
    * PREFIX only (first n−points elements): per-phase medians and the
    * trend line come from the prefix, then baseline = seasonal + trend
    * extrapolates across the FULL axis (the tail's baseline IS the
    * forecast). Pinned: residual = x − baseline on the prefix, null on
    * the forecast tail (the tail's raw values are axis filler, not
    * observations). Same array<struct<base, seas, tr, resid>> shape as
    * [[decomposeStruct]]. */
  def forecastStruct(series: Column, points: Column, period: Column,
                     trendKind: String): Column =
    kernel(Seq(dbl(series), points.cast("int"), period.cast("int")),
      trendKind, "forecast")

  /** array<struct<flag, score, base>> — ctukey 10/90 residual fences,
    * |score| ≥ threshold flags ±1. */
  def anomaliesStruct(series: Column, threshold: Column, period: Column,
                      trendKind: String): Column =
    kernel(Seq(dbl(series), threshold.cast("double"), period.cast("int")),
      trendKind, "anomalies")
}
