package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Special-function scalars for the KQL surface (gamma / loggamma /
  * erf / erfc), built purely from codegen'd Column arithmetic — no
  * UDFs, no custom expressions, so they stay inside whole-stage
  * codegen and the optimizer can constant-fold literal arguments.
  *
  * Pinned algorithms (documented engine choices, spec-gated):
  *  - loggamma/gamma: Lanczos approximation (g = 7, 9 coefficients,
  *    ~15 significant digits) with the sin-reflection for x < 0.5 —
  *    matches libm-backed oracles well past the 6-decimal gates.
  *  - erf: Abramowitz & Stegun 7.1.26 rational approximation
  *    (|error| ≤ 1.5e-7) — chosen BECAUSE it is exactly expressible
  *    in an oracle engine that lacks erf (exp + polynomial only).
  */
object KMath {

  private val lanczosG = 7.5 // g + 0.5 with the classic x-1 shift
  private val lanczosC: Seq[Double] = Seq(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
  private val halfLn2Pi = 0.5 * math.log(2 * math.Pi)

  /** ln Γ(x) for x ≥ 0.5 (no reflection). */
  private def lgammaCore(x: Column): Column = {
    val y = x - lit(1.0)
    val a = lanczosC.zipWithIndex.tail.foldLeft(lit(lanczosC.head): Column) {
      case (acc, (c, i)) => acc + lit(c) / (y + lit(i.toDouble))
    }
    val t = y + lit(lanczosG)
    lit(halfLn2Pi) + (y + lit(0.5)) * log(t) - t + log(a)
  }

  /** Kusto loggamma(x) = ln |Γ(x)| (reflection for x < 0.5). */
  def loggamma(x0: Column): Column = {
    val x = x0.cast("double")
    when(x < 0.5,
      log(lit(math.Pi) / abs(sin(lit(math.Pi) * x))) - lgammaCore(lit(1.0) - x))
      .otherwise(lgammaCore(x))
  }

  /** Γ(x); the reflection Γ(x) = π / (sin(πx) Γ(1−x)) carries the sign
    * for negative non-integer x naturally through sin. */
  def gamma(x0: Column): Column = {
    val x = x0.cast("double")
    when(x < 0.5,
      lit(math.Pi) / (sin(lit(math.Pi) * x) * exp(lgammaCore(lit(1.0) - x))))
      .otherwise(exp(lgammaCore(x)))
  }

  /** erf(x), A&S 7.1.26 (Horner form — the oracle mirrors this shape). */
  def erf(x0: Column): Column = {
    val x = x0.cast("double")
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(x))
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t +
      lit(1.421413741)) * t + lit(-0.284496736)) * t + lit(0.254829592)) * t
    val y = lit(1.0) - poly * exp(-(x * x))
    signum(x) * y
  }

  def erfc(x: Column): Column = lit(1.0) - erf(x)
}
