package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Statistical scalar family: regularized incomplete beta and the
  * functions built on it — `beta_cdf`/`beta_pdf`/`beta_inv` and
  * `welch_test` (Welch's unequal-variance t-test p-value, the Kusto
  * scalar for comparing two sample means from their summary stats).
  *
  * All public-textbook numerics: Lanczos (g=7, n=9) log-gamma — same
  * coefficient set as [[KMath]] — and the standard continued-fraction
  * evaluation of I_x(a,b) (Numerical Recipes §6.4 shape; 3e-14
  * tolerance, 200-iteration cap). The Student-t survival function
  * follows from I via P(|T| > t) = I_{ν/(ν+t²)}(ν/2, ½), which the
  * WelchSpec pins against the exact closed forms at ν = 1
  * (1 − (2/π)·atan t) and ν = 2 (1 − t/√(2+t²)).
  *
  * Scale shape: these run on AGGREGATED rows (group summary stats →
  * one p-value per group), so the expression is CodegenFallback by
  * design — the per-group cost is nanoseconds, and the hot path (the
  * aggregation producing the stats) stays whole-stage codegen.
  */
object KStat {
  private val C = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def logGamma(x0: Double): Double = {
    if (x0.isNaN) return Double.NaN
    if (x0 < 0.5) {
      math.log(math.Pi / math.abs(math.sin(math.Pi * x0))) - logGamma(1.0 - x0)
    } else {
      val x = x0 - 1.0
      var a = C(0)
      val t = x + 7.5
      var i = 1
      while (i < 9) { a += C(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val MaxIt = 200; val Eps = 3e-14; val FpMin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= MaxIt && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    if (a <= 0 || b <= 0 || x.isNaN) return Double.NaN
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
      a * math.log(x) + b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
    else 1.0 - bt * betacf(b, a, 1.0 - x) / b
  }

  /** beta_cdf(x, α, β) = I_x(α, β); x outside [0,1] clamps (CDF). */
  def betaCdf(x: Double, a: Double, b: Double): Double = betainc(a, b, x)

  /** beta_pdf(x, α, β) — closed form; 0 outside (0,1). */
  def betaPdf(x: Double, a: Double, b: Double): Double = {
    if (a <= 0 || b <= 0 || x.isNaN) return Double.NaN
    if (x <= 0 || x >= 1) return 0.0
    math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
      (a - 1.0) * math.log(x) + (b - 1.0) * math.log(1.0 - x))
  }

  /** beta_inv(p, α, β): the p-quantile, by bisection on the monotone
    * CDF — 100 rounds ⇒ ~1e-30 interval, deterministic. */
  def betaInv(p: Double, a: Double, b: Double): Double = {
    if (a <= 0 || b <= 0 || p.isNaN || p < 0 || p > 1) return Double.NaN
    if (p == 0) return 0.0
    if (p == 1) return 1.0
    var lo = 0.0; var hi = 1.0
    var i = 0
    while (i < 100) {
      val mid = 0.5 * (lo + hi)
      if (betainc(a, b, mid) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** Two-sided Welch t-test p-value from summary stats
    * (mean, variance, count per sample). Degenerate inputs (n < 2,
    * negative variance) → NaN (surfaces as SQL null); both variances
    * zero → exact p of the point comparison (1 if means equal else 0). */
  def welchTest(m1: Double, v1: Double, n1: Double,
                m2: Double, v2: Double, n2: Double): Double = {
    if (n1 < 2 || n2 < 2 || v1 < 0 || v2 < 0) return Double.NaN
    val se1 = v1 / n1; val se2 = v2 / n2
    val se = se1 + se2
    if (se == 0) return if (m1 == m2) 1.0 else 0.0
    val t2 = (m1 - m2) * (m1 - m2) / se
    val df = se * se / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    betainc(df / 2.0, 0.5, df / (df + t2))
  }
}

/** Dispatcher expression for the KStat family — see the object doc for
  * why CodegenFallback is the right shape here (aggregated-row inputs). */
case class KStatCall(fname: String, children: Seq[Expression])
  extends Expression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fname expects DOUBLE arguments, got ${children.map(_.dataType.catalogString).mkString(", ")}")
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val d = vs.map(_.asInstanceOf[Double])
    val r = fname match {
      case "welch_test" => KStat.welchTest(d(0), d(1), d(2), d(3), d(4), d(5))
      case "beta_cdf" => KStat.betaCdf(d(0), d(1), d(2))
      case "beta_pdf" => KStat.betaPdf(d(0), d(1), d(2))
      case "beta_inv" => KStat.betaInv(d(0), d(1), d(2))
      case other => throw new IllegalStateException(s"unknown KStat function '$other'")
    }
    if (r.isNaN) null else r
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KStatCall =
    copy(children = cs)
}
