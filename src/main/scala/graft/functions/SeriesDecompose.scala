package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Series decomposition / anomaly scoring over `make-series` arrays — the
  * KQL `series_decompose` / `series_decompose_anomalies` / `series_outliers`
  * surface (the production anomaly stack above `make-series`; reference
  * context: the Grafana dashboards shipped with the connector,
  * docker-quickstart/grafana/dashboards/kafka-connect-metrics.json).
  *
  * Everything here is a pure Column-lambda over one array cell: map-only,
  * zero shuffle, bounded by the make-series axis length (≤1e6 bins by the
  * compiler's axis cap) — so a 100 TB events table decomposes in the same
  * single pass that built the series.
  *
  * EXPRESSION-TREE DISCIPLINE: a naive composition (trend embedding the
  * seasonal tree, residual embedding both, outlier quantiles re-embedding
  * the residual…) duplicates subtrees combinatorially and drives Catalyst
  * analysis into minutes-long tree walks. Every shared intermediate is
  * therefore bound ONCE through [[let1]] — a single-element `transform`
  * whose lambda variable gives the expression a name — so each logical
  * step appears exactly once in the tree and is evaluated exactly once
  * per row. The compiler additionally materializes the component struct
  * as one hidden column (CollapseProject refuses to inline a non-trivial
  * expression referenced more than once, which keeps it single-copy in
  * the optimized plan too).
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

  /** Let-binding for Column expressions: binds `value` once via a
    * single-element array lambda, so `body` can reference it many times
    * while the tree (and per-row evaluation) contains it exactly once. */
  private def let1(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Input normalization: everything computes in doubles. */
  private def dbl(a: Column): Column = transform(a, _.cast("double"))

  /** Linear-interpolated percentile over an ALREADY SORTED array. The
    * sorted array should be a let1/attribute reference — this helper
    * references it four times. */
  def pctSorted(s: Column, p: Double): Column = {
    val m = size(s)
    val pos = (m - lit(1)).cast("double") * lit(p)
    val lo = floor(pos).cast("int")
    val vlo = element_at(s, lo + 1).cast("double")
    val vhi = element_at(s, ceil(pos).cast("int") + 1).cast("double")
    when(m === 0, lit(null).cast("double"))
      .otherwise(vlo + (vhi - vlo) * (pos - lo.cast("double")))
  }

  private def medianOf(arr: Column): Column =
    let1(array_sort(arr), s => pctSorted(s, 0.5))

  /** Per-phase-median seasonal component, tiled to the series length.
    * `xd` must be a bound reference (let1 var or column attribute). */
  private def seasonalOf(xd: Column, period: Column): Column = {
    val p = period.cast("int")
    when(p < 0, raise_error(lit(
      "series_decompose: period autodetect (-1) is not supported — pass an explicit period")))
      .when(p > 0,
        let1(transform(sequence(lit(0), greatest(p, lit(1)) - 1), ph =>
            medianOf(filter(xd, (_, i) => pmod(i, p) === ph))),
          meds =>
            transform(sequence(lit(0), size(xd) - 1), i => element_at(meds, pmod(i, p) + 1))))
      .otherwise(transform(xd, _ => lit(0.0)))
  }

  /** Public `series_seasonal(x, period)` surface: the same per-phase-
    * median component decompose uses, computed standalone. */
  def seasonal(series: Column, period: Column): Column =
    let1(dbl(series), xd => seasonalOf(xd, period))

  /** `series_iir(x, b, a)` — recursive (infinite-impulse-response)
    * filter, Kusto semantics: y[i] = (Σ_j b[j]·x[i−j] − Σ_{k≥1}
    * a[k]·y[i−k]) / a[0]; out-of-range history reads 0. Sequential by
    * nature — ONE aggregate fold over the index axis builds the output
    * array (O(n·(|a|+|b|)) work per cell plus O(n²) array appends,
    * axis-sized like the fill family — dashboard axes, not corpora). */
  def iir(series: Column, bCoef: Column, aCoef: Column): Column = {
    val x = dbl(series); val b = dbl(bCoef); val a = dbl(aCoef)
    when(size(x) === 0, array().cast("array<double>"))
      .otherwise(
        aggregate(sequence(lit(0), size(x) - 1), array().cast("array<double>"), (ys, i) => {
          val bsum = aggregate(sequence(lit(0), size(b) - 1), lit(0.0), (s, j) =>
            s + element_at(b, (j + 1).cast("int")) *
              when(i - j >= 0, element_at(x, (i - j + 1).cast("int"))).otherwise(lit(0.0)))
          val asum = when(size(a) > 1,
              aggregate(sequence(lit(1), size(a) - 1), lit(0.0), (s, k) =>
                s + element_at(a, (k + 1).cast("int")) *
                  when(i - k >= 0, element_at(ys, (i - k + 1).cast("int"))).otherwise(lit(0.0))))
            .otherwise(lit(0.0))
          concat(ys, array((bsum - asum) / element_at(a, 1)))
        }))
  }

  /** Sequential IEEE left-fold dot product of two equal-length series
    * (the q25 determinism technique); scalar second operand multiplies
    * elementwise against the sum. */
  def dotProduct(aS: Column, bS: Column): Column =
    aggregate(zip_with(dbl(aS), dbl(bS), (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def magnitude(s: Column): Column =
    sqrt(aggregate(dbl(s), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either magnitude is zero (pinned —
    * deterministic where the 0/0 form is undefined). */
  def cosineSimilarity(aS: Column, bS: Column): Column =
    let1(magnitude(aS) * magnitude(bS), denom =>
      when(denom === 0.0, lit(0.0)).otherwise(dotProduct(aS, bS) / denom))

  /** Trend array over the de-seasonalized series `d` (bound reference). */
  private def trendOf(d: Column, kind: String): Column = {
    val n = size(d).cast("double")
    val sy = aggregate(d, lit(0.0), (s, x) => s + x)
    kind match {
      case "none" => transform(d, _ => lit(0.0))
      case "avg" => let1(sy / n, m => transform(d, _ => m))
      case "linefit" =>
        // OLS vs bin index: closed-form Σi / Σi² keep the fold single-pass;
        // slope/intercept bind once so the per-element lambda reads scalars.
        val sxy = aggregate(sequence(lit(0), size(d) - 1), lit(0.0), (s, i) =>
          s + i.cast("double") * element_at(d, i.cast("int") + 1))
        val sx = n * (n - 1) / lit(2.0)
        val sxx = n * (n - 1) * (lit(2.0) * n - 1) / lit(6.0)
        val co = let1(struct(sx.as("sx"), sy.as("sy"), sxy.as("sxy"), sxx.as("sxx"), n.as("n")), c => {
          val denom = c("n") * c("sxx") - c("sx") * c("sx")
          val slope = when(denom =!= 0.0, (c("n") * c("sxy") - c("sx") * c("sy")) / denom)
            .otherwise(lit(0.0))
          val icept = when(c("n") > 0, (c("sy") - slope * c("sx")) / c("n")).otherwise(lit(0.0))
          struct(slope.as("m"), icept.as("b"))
        })
        let1(co, c =>
          transform(sequence(lit(0), size(d) - 1), i => c("b") + c("m") * i.cast("double")))
      case other =>
        throw new IllegalArgumentException(
          s"series_decompose: trend must be 'linefit', 'avg' or 'none', got '$other'")
    }
  }

  /** One array<struct<base, seas, tr, resid>> column — Kusto's component
    * order is (baseline, seasonal, trend, residual); the compiler
    * materializes this once and extracts fields per assigned name. */
  def decomposeStruct(series: Column, period: Column, trendKind: String): Column =
    let1(dbl(series), xd =>
      let1(seasonalOf(xd, period), seas =>
        let1(trendOf(zip_with(xd, seas, _ - _), trendKind), tr =>
          transform(sequence(lit(0), size(xd) - 1), i =>
            let1(element_at(seas, i + 1) + element_at(tr, i + 1), base =>
              struct(
                base.as("base"),
                element_at(seas, i + 1).as("seas"),
                element_at(tr, i + 1).as("tr"),
                (element_at(xd, i + 1) - base).as("resid")))))))

  /** Tukey-fence outlier scores; quantiles (pLo, pHi) per the pinned spec.
    * `series` may be any expression — it binds once internally. */
  def outliers(series: Column, pLo: Double, pHi: Double): Column =
    let1(dbl(series), xd =>
      let1(array_sort(xd), srt =>
        let1(struct(pctSorted(srt, pLo).as("ql"), pctSorted(srt, pHi).as("qh")), q =>
          let1(q("qh") - q("ql"), iqr =>
            transform(xd, v =>
              when(iqr.isNull || iqr === 0.0, lit(0.0))
                .when(v > q("qh"), (v - q("qh")) / iqr)
                .when(v < q("ql"), (v - q("ql")) / iqr)
                .otherwise(lit(0.0)))))))

  /** Gap-filling family over make-series arrays with null gaps (the
    * no-`default` make-series form). All compute in doubles; the index
    * scans are O(n²) per series cell — fine for dashboard-scale axes
    * (the make-series compiler caps the axis at 1e6; fills are meant for
    * the tens-to-thousands-of-bins regime). Pinned edge rules:
    * fill_forward leaves leading nulls (no prior value), fill_backward
    * leaves trailing nulls, fill_linear uses the nearest non-null when
    * only one side exists and leaves all-null series null. */
  def fillConst(series: Column, v: Column): Column =
    transform(dbl(series), x => coalesce(x, v.cast("double")))

  def fillForward(series: Column): Column =
    let1(dbl(series), xd =>
      transform(sequence(lit(0), size(xd) - 1), i =>
        aggregate(sequence(lit(0), i), lit(null).cast("double"), (acc, j) =>
          coalesce(element_at(xd, j.cast("int") + 1), acc))))

  def fillBackward(series: Column): Column =
    let1(dbl(series), xd =>
      transform(sequence(lit(0), size(xd) - 1), i =>
        aggregate(sequence(size(xd) - 1, i, lit(-1)), lit(null).cast("double"), (acc, j) =>
          coalesce(element_at(xd, j.cast("int") + 1), acc))))

  def fillLinear(series: Column): Column =
    let1(dbl(series), xd =>
      transform(sequence(lit(0), size(xd) - 1), i =>
        let1(element_at(xd, i + 1), cur =>
          let1(struct(
              // last non-null index ≤ i, first non-null index ≥ i
              aggregate(sequence(lit(0), i), lit(null).cast("int"), (acc, j) =>
                when(element_at(xd, j.cast("int") + 1).isNotNull, j.cast("int")).otherwise(acc)).as("li"),
              aggregate(sequence(size(xd) - 1, i, lit(-1)), lit(null).cast("int"), (acc, j) =>
                when(element_at(xd, j.cast("int") + 1).isNotNull, j.cast("int")).otherwise(acc)).as("ni")), ix =>
            when(cur.isNotNull, cur)
              .when(ix("li").isNull && ix("ni").isNull, lit(null).cast("double"))
              .when(ix("li").isNull, element_at(xd, ix("ni") + 1))
              .when(ix("ni").isNull, element_at(xd, ix("li") + 1))
              .otherwise(
                element_at(xd, ix("li") + 1) +
                  (element_at(xd, ix("ni") + 1) - element_at(xd, ix("li") + 1)) *
                    (i - ix("li")).cast("double") / (ix("ni") - ix("li")).cast("double"))))))

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
    let1(dbl(series), xd =>
      let1((size(xd) - points.cast("int")).cast("int"), ntrain =>
        let1(slice(xd, lit(1), ntrain), train =>
          let1(seasonalOf(train, period), seasT =>
            let1(trendOf(zip_with(train, seasT, _ - _), trendKind), trT => {
              val p = period.cast("int")
              // extrapolate both components over the full axis: seasonal
              // tiles the TRAINING phase medians; trend refits its own
              // closed form from the training arrays (constant for
              // 'avg'/'none', line for 'linefit' — extended by index)
              val seasFull = when(p > 0,
                  transform(sequence(lit(0), size(xd) - 1), i =>
                    element_at(seasT, pmod(i, p) + 1)))
                .otherwise(transform(xd, _ => lit(0.0)))
              // linefit/avg/none all yield trend values that are affine in
              // the index: recover (slope, intercept) from the fitted
              // training array (first two points span any affine form;
              // constant forms have slope 0) and extend.
              val t1 = element_at(trT, 1)
              val slope = when(size(trT) >= 2, element_at(trT, 2) - t1).otherwise(lit(0.0))
              val trFull = transform(sequence(lit(0), size(xd) - 1), i =>
                t1 + slope * i.cast("double"))
              let1(seasFull, sf =>
                let1(trFull, tf =>
                  transform(sequence(lit(0), size(xd) - 1), i =>
                    let1(element_at(sf, i + 1) + element_at(tf, i + 1), base =>
                      struct(
                        base.as("base"),
                        element_at(sf, i + 1).as("seas"),
                        element_at(tf, i + 1).as("tr"),
                        when(i < ntrain, element_at(xd, i + 1) - base)
                          .otherwise(lit(null).cast("double")).as("resid"))))))
            })))))

  /** One array<struct<flag, score, base>> column — Kusto's output order
    * for series_decompose_anomalies. Scores the decomposition residual
    * with 'ctukey' (10/90) fences. */
  def anomaliesStruct(series: Column, threshold: Column, period: Column,
                      trendKind: String): Column =
    let1(decomposeStruct(series, period, trendKind), parts =>
      let1(outliers(parts.getField("resid"), 0.10, 0.90), score =>
        let1(threshold.cast("double"), th =>
          transform(sequence(lit(0), size(parts) - 1), i =>
            let1(element_at(score, i + 1), sc =>
              struct(
                when(sc >= th, lit(1L)).when(sc <= -th, lit(-1L)).otherwise(lit(0L)).as("flag"),
                sc.as("score"),
                element_at(parts, i + 1).getField("base").as("base")))))))
}
