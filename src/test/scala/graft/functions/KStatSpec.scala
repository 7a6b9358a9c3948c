package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the incomplete-beta family against exact closed forms — no
  * external stats library needed:
  *  - I_x(1, b) = 1 − (1−x)^b and I_x(a, 1) = x^a
  *  - symmetry I_½(a, a) = ½
  *  - Student-t via I: ν=1 ⇒ P(|T|>t) = 1 − (2/π)·atan t;
  *    ν=2 ⇒ P(|T|>t) = 1 − t/√(2+t²)
  */
class KStatSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double, tol: Double = 1e-10) =
    assert(math.abs(a - b) <= tol, s"$a vs $b")

  test("betainc closed forms and symmetry") {
    for (x <- Seq(0.1, 0.3, 0.7, 0.95); b <- Seq(0.5, 1.0, 2.5, 7.0)) {
      approx(KStat.betainc(1.0, b, x), 1.0 - math.pow(1.0 - x, b))
      approx(KStat.betainc(b, 1.0, x), math.pow(x, b))
    }
    for (a <- Seq(0.5, 1.0, 2.0, 5.0, 20.0))
      approx(KStat.betainc(a, a, 0.5), 0.5)
    assert(KStat.betainc(2.0, 3.0, 0.0) == 0.0)
    assert(KStat.betainc(2.0, 3.0, 1.0) == 1.0)
    assert(KStat.betainc(-1.0, 2.0, 0.5).isNaN)
  }

  test("beta pdf/cdf/inv consistency") {
    // pdf closed form: x^(a−1)(1−x)^(b−1)/B(a,b); B(2,2)=1/6
    approx(KStat.betaPdf(0.5, 2.0, 2.0), 1.5)
    approx(KStat.betaCdf(0.5, 2.0, 2.0), 0.5)
    approx(KStat.betaCdf(0.25, 2.0, 1.0), 0.0625)
    // inv is the exact inverse of cdf
    for (p <- Seq(0.05, 0.25, 0.5, 0.9); a <- Seq(0.7, 2.0); b <- Seq(1.5, 4.0)) {
      val x = KStat.betaInv(p, a, b)
      approx(KStat.betaCdf(x, a, b), p, 1e-9)
    }
    assert(KStat.betaInv(0.0, 2.0, 2.0) == 0.0)
    assert(KStat.betaInv(1.0, 2.0, 2.0) == 1.0)
  }

  test("welch_test against exact ν=1 and ν=2 Student-t forms") {
    // v2 = 0 with n2 ≥ 2 ⇒ se = v1/n1 only ⇒ ν = n1−1 = 1
    // t = (m1−m2)/√(v1/n1) = 1/√2
    val p1 = KStat.welchTest(1.0, 4.0, 2.0, 0.0, 0.0, 5.0)
    val t1 = 1.0 / math.sqrt(2.0)
    approx(p1, 1.0 - (2.0 / math.Pi) * math.atan(t1))
    // equal se with n1=n2=2 ⇒ ν = 2; m1−m2 = 2, v=2, n=2 ⇒ t = √2
    val p2 = KStat.welchTest(2.0, 2.0, 2.0, 0.0, 2.0, 2.0)
    val t2 = math.sqrt(2.0)
    approx(p2, 1.0 - t2 / math.sqrt(2.0 + t2 * t2))
    // t = 0 ⇒ p = 1; bigger |t| ⇒ smaller p (monotone)
    approx(KStat.welchTest(5.0, 3.0, 10.0, 5.0, 3.0, 10.0), 1.0)
    val ps = Seq(0.5, 1.0, 2.0, 4.0).map(d =>
      KStat.welchTest(d, 3.0, 10.0, 0.0, 3.0, 10.0))
    assert(ps == ps.sorted.reverse && ps.forall(p => p > 0 && p < 1))
    // degenerate: n < 2 → NaN; both variances zero, equal/unequal means
    assert(KStat.welchTest(1, 1, 1, 0, 1, 5).isNaN)
    assert(KStat.welchTest(3, 0, 5, 3, 0, 5) == 1.0)
    assert(KStat.welchTest(3, 0, 5, 2, 0, 5) == 0.0)
  }
}
