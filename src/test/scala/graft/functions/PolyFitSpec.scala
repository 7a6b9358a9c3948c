package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PolyFitSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private def run(kql: String) = {
    import spark.implicits._
    graft.kql.KqlCompiler.compile(kql, _ => Seq(Tuple1(1L)).toDF("id"))
  }

  test("exact quadratic recovered; rsquare 1; residual variance 0") {
    // y = 2x² − 3x + 1 on x = 0..7
    val ys = (0 until 8).map(x => 2.0 * x * x - 3.0 * x + 1.0).mkString(", ")
    val out = run(
      s"""t | extend (rs, co, vr, rv, pf) = series_fit_poly(pack_array($ys), 2)
         | | project rs = round(rs, 9), c2 = round(co[0], 9), c1 = round(co[1], 9),
         |           c0 = round(co[2], 9), rv = round(rv, 9),
         |           rt = round(series_sum(series_abs(series_subtract(pack_array($ys), pf))), 6)
         |""".stripMargin).head()
    assert(out.getDouble(0) == 1.0)
    assert(out.getDouble(1) == 2.0 && out.getDouble(2) == -3.0 && out.getDouble(3) == 1.0)
    assert(out.getDouble(4) == 0.0 && out.getDouble(5) == 0.0)
  }

  test("degree 1 matches series_fit_line; explicit x; constant series pins rsquare 1") {
    val out = run(
      """t | extend a = pack_array(3.0, 5.0, 9.0, 10.0, 14.0)
        | | extend (rs1, sl, vr1, rv1, ic, lf) = series_fit_line(a)
        | | extend (rs2, co, vr2, rv2, pf) = series_fit_poly(a)
        | | extend (rs3, co3, vr3, rv3, pf3) = series_fit_poly(a, pack_array(0.0, 1.0, 2.0, 3.0, 4.0), 1)
        | | extend (rs4, co4, vr4, rv4, pf4) = series_fit_poly(pack_array(7.0, 7.0, 7.0))
        | | project d1 = round(co[0] - sl, 9), d0 = round(co[1] - ic, 9),
        |           dr = round(rs2 - rs1, 9), dv = round(vr2 - vr1, 9),
        |           dx = round(co3[0] - sl, 9), rs4
        |""".stripMargin).head()
    assert(out.getDouble(0) == 0.0 && out.getDouble(1) == 0.0)
    assert(out.getDouble(2) == 0.0 && out.getDouble(3) == 0.0)
    assert(out.getDouble(4) == 0.0)
    assert(out.getDouble(5) == 1.0)
  }

  test("degree clamps to n-1 (interpolation); bad degree is loud") {
    val out = run(
      """t | extend (rs, co, vr, rv, pf) = series_fit_poly(pack_array(1.0, 4.0), 5)
        | | project n = array_length(co), rv = round(rv, 9)""".stripMargin).head()
    assert(out.getLong(0) == 2L && out.getDouble(1) == 0.0) // line through 2 points
    assertThrows[graft.kql.KqlCompiler.KqlParseException](run(
      "t | extend (a, b, c, d, e) = series_fit_poly(pack_array(1.0), 9) | project a"))
  }
}
