package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** RFC 3492 conformance for the Punycode natives, with sample strings
  * from the RFC and goldens cross-checked against Python's `punycode`
  * codec; plus KMath special-function accuracy pins. */
class PunycodeSpec extends AnyFunSuite {

  val goldens = Seq(
    "ü" -> "tda",
    "bücher" -> "bcher-kva",
    "münchen" -> "mnchen-3ya",
    "académie-française" -> "acadmie-franaise-npb1a",
    "日本語" -> "wgv71a119e",
    "déjà" -> "dj-kia8a",
    "clické" -> "click-fsa",
    "abc" -> "abc-", // pure-ASCII: basic string + delimiter, per the RFC
    "" -> "")

  test("encode matches the RFC sample/codec goldens") {
    goldens.foreach { case (in, out) => assert(Punycode.encode(in) == out, in) }
  }

  test("decode inverts encode (incl. supplementary-plane input)") {
    (goldens.map(_._1) :+ "a😀b").foreach { s =>
      assert(Punycode.decode(Punycode.encode(s)) == s, s)
    }
  }

  test("domain form applies xn-- per non-ASCII label only") {
    assert(Punycode.encodeDomain("bücher.example.com") == "xn--bcher-kva.example.com")
    assert(Punycode.encodeDomain("plain.example.com") == "plain.example.com")
    assert(Punycode.decodeDomain("xn--bcher-kva.example.com") == "bücher.example.com")
    assert(Punycode.decodeDomain("XN--bcher-kva.com") == "bücher.com")
  }

  test("malformed decode surfaces null through the UTF8String bridge") {
    import org.apache.spark.unsafe.types.UTF8String
    assert(Punycode.decodeU(UTF8String.fromString("é-x")) == null)
    assert(Punycode.decodeU(UTF8String.fromString("abc-!!")) == null)
    assert(Punycode.decodeU(UTF8String.fromString("bcher-kva")).toString == "bücher")
  }

  test("KMath gamma/loggamma/erf track reference values") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(0.5, 1.0, 2.5, 3.5, -0.7, -3.7).toDF("x")
    val rows = df.select(col("x"), KMath.gamma(col("x")).as("g"),
        KMath.loggamma(col("x")).as("lg")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toMap2
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(close(rows(0.5)._1, math.sqrt(math.Pi)))
    assert(close(rows(1.0)._1, 1.0))
    assert(close(rows(2.5)._1, 1.329340388179137))
    assert(close(rows(-0.7)._1, -4.273669982410843)) // sign via reflection
    assert(close(rows(2.5)._2, 0.2846828704729192))
    assert(close(rows(-3.7)._2, math.log(math.abs(rows(-3.7)._1))))
    val erfs = Seq(0.0, 0.5, -0.5, 2.0).toDF("z")
      .select(col("z"), KMath.erf(col("z")).as("e")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(erfs(0.0) == 0.0)
    assert(math.abs(erfs(0.5) - 0.5204998778) < 2e-7) // A&S 7.1.26 error bound
    assert(erfs(-0.5) == -erfs(0.5))
    assert(math.abs(erfs(2.0) - 0.9953222650) < 2e-7)
  }

  private implicit class Map2[A](s: Array[(A, Double, Double)]) {
    def toMap2: Map[A, (Double, Double)] = s.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
