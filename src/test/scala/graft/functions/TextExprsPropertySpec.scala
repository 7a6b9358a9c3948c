package graft.functions

import graft.queries.LlmQueries
import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property equivalence: each native Catalyst expression must be
  * bit-identical to the SQL higher-order-function form it replaced —
  * the oracle parity of the LLM queries depends on it. q26 proved that a
  * silent type mismatch (`getDouble` on decimal storage) corrupts values
  * without an error, so this spec also pins the analysis-time type guards.
  *
  * Sampling is ScalaCheck with a fixed seed (one Spark job per function,
  * not per sample): generated corpus covers empty strings, single tokens,
  * repeated shingles, irregular whitespace, accents, CJK, and non-BMP
  * emoji (surrogate pairs — the codepoint-vs-UTF-16 trap for winnowing).
  */
class TextExprsPropertySpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val tokenGen: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    2 -> Gen.oneOf("the", "The", "a", "of", "FOX", "x1", "2024", "a.b,c!"),
    1 -> Gen.oneOf("éclair", "日本語", "straße", "Ωmega"),
    1 -> Gen.oneOf("👍🎉", "🚀", "a👍b", "𝕊urrogate"))

  private val sepGen: Gen[String] = Gen.frequency(6 -> " ", 2 -> "  ", 1 -> "\t", 1 -> " \n ")

  private val textGen: Gen[String] = for {
    n    <- Gen.frequency(1 -> 0, 1 -> 1, 2 -> 2, 2 -> 3, 6 -> Gen.choose(4, 30))
    toks <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
    pad  <- Gen.oneOf("", " ", "  ")
  } yield pad + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString

  private lazy val corpus: Seq[String] =
    Gen.listOfN(300, textGen).pureApply(Gen.Parameters.default, Seed(42L)) ++
      Seq("", " ", "abcdefghijklmnop", "👍👍👍👍👍👍👍👍👍👍👍👍", "one two three one two three")

  private def corpusView(): Unit = {
    import spark.implicits._
    LlmQueries.registerFunctions(spark)
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").createOrReplaceTempView("corpus")
  }

  /** Runs one query that counts rows where the native column and the SQL
    * HOF column differ under null-safe equality; asserts zero. */
  private def assertEquivalent(native: String, hof: String): Unit = {
    corpusView()
    val bad = spark.sql(s"SELECT id, $native AS nat, $hof AS ref FROM corpus")
      .where("NOT (nat <=> ref)").collect()
    assert(bad.isEmpty, s"native/SQL divergence on ids ${bad.take(5).mkString(", ")}")
  }

  test("word_shingles ≡ array_distinct(transform(...concat_ws(slice(...))))") {
    assertEquivalent(
      "word_shingles(text, 3)",
      """CASE WHEN size(split(lower(text), '\\s+')) >= 3
        |THEN array_distinct(transform(sequence(0, size(split(lower(text), '\\s+')) - 3),
        |       i -> concat_ws(' ', slice(split(lower(text), '\\s+'), i + 1, 3))))
        |ELSE array() END""".stripMargin)
  }

  test("word_shingle_count ≡ size(word_shingles) — for n = 1, 2, 3, 5") {
    // the count path interns tokens and packs id-tuples instead of
    // materializing strings; it must agree exactly with the array form
    for (n <- Seq(1, 2, 3, 5))
      assertEquivalent(
        s"word_shingle_count(text, $n)",
        s"cast(size(word_shingles(text, $n)) AS bigint)")
  }

  test("word_shingle_hashes ≡ transform(word_shingles, xxhash64)") {
    assertEquivalent(
      "word_shingle_hashes(text, 3)",
      "transform(word_shingles(text, 3), s -> xxhash64(s))")
  }

  test("minhash_sig ≡ per-lane min of (a·conv(md5)%p + b) % p over shingles") {
    val p = LlmQueries.MinhashP
    val lanes = LlmQueries.MinhashParams.map { case (a, b) =>
      s"""array_min(transform(word_shingles(text, 3),
         |  s -> ($a * (cast(conv(substr(md5(s), 1, 15), 16, 10) AS bigint) % $p) + $b) % $p))""".stripMargin
    }.mkString(", ")
    assertEquivalent(
      "minhash_sig(text)",
      s"""CASE WHEN size(split(lower(text), '\\\\s+')) >= 3
         |THEN array($lanes)
         |ELSE cast(null AS array<bigint>) END""".stripMargin)
  }

  test("simhash32 ≡ per-bit vote fold over token md5 hashes") {
    assertEquivalent(
      "simhash32(text)",
      """aggregate(sequence(0, 31), cast(0 AS bigint), (sig, i) ->
        |  sig + CASE WHEN aggregate(split(lower(text), '\\s+'), 0, (v, tok) ->
        |                v + (cast((shiftright(cast(conv(substr(md5(tok), 1, 8), 16, 10) AS bigint), i) & 1) AS int) * 2 - 1)) > 0
        |             THEN shiftleft(cast(1 AS bigint), i) ELSE cast(0 AS bigint) END)""".stripMargin)
  }

  test("winnow_fps ≡ distinct sliding-window minima of md5 char k-grams") {
    assertEquivalent(
      "winnow_fps(text, 8, 4)",
      """CASE WHEN length(text) - 7 >= 4
        |THEN array_distinct(transform(sequence(1, length(text) - 7 - 3),
        |       wi -> array_min(slice(transform(sequence(1, length(text) - 7),
        |                               i -> md5(substr(text, i, 8))), wi, 4))))
        |ELSE cast(null AS array<string>) END""".stripMargin)
  }

  test("dot_d ≡ sequential aggregate fold (bit-identical IEEE order)") {
    import spark.implicits._
    LlmQueries.registerFunctions(spark)
    val vecGen = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 1000.0)))
    val pairs = Gen.listOfN(200, Gen.zip(vecGen, vecGen))
      .pureApply(Gen.Parameters.default, Seed(7L))
      .map { case (a, b) => val n = math.min(a.length, b.length); (a.take(n), b.take(n)) }
    pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val bad = spark.sql(
      """SELECT id, dot_d(a, b) AS nat,
        |       aggregate(sequence(0, size(a) - 1), cast(0.0 AS double),
        |                 (s, i) -> s + element_at(a, i + 1) * element_at(b, i + 1)) AS ref
        |FROM vecs""".stripMargin).where("NOT (nat <=> ref)").collect()
    assert(bad.isEmpty, s"dot_d divergence on ids ${bad.take(5).mkString(", ")}")
  }

  test("deflate_ratio ≡ direct java.util.zip deflate, and orders repetitive < diverse") {
    corpusView()
    // exact parity with a direct Deflater run on the same UTF-8 bytes
    def direct(s: String): Double = {
      val bytes = s.getBytes("UTF-8")
      if (bytes.isEmpty) return 1.0
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      total.toDouble / bytes.length
    }
    val got = spark.sql("SELECT id, deflate_ratio(text) AS r FROM corpus")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == direct(t), s"deflate_ratio divergence on id $i")
    }
    // the quality-signal property: repetition compresses, noise does not
    val rep = direct("spam spam spam spam spam spam spam spam spam spam spam spam")
    val div = direct("quick brown foxes jumped over sixteen lazy unrelated words z9")
    assert(rep < 0.4 && rep < div, s"repetitive $rep must compress below diverse $div")
  }

  test("type guards: decimal/int arrays and non-string inputs fail at analysis") {
    LlmQueries.registerFunctions(spark)
    val ex = intercept[AnalysisException] {
      spark.sql("SELECT dot_d(array(cast(1.0 AS decimal(10,2))), array(cast(2.0 AS decimal(10,2))))").collect()
    }
    assert(ex.getMessage.contains("ARRAY<DOUBLE>"))
    intercept[AnalysisException] {
      spark.sql("SELECT dot_d(array(1, 2), array(3, 4))").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(42, 3)").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT winnow_fps(array('a'), 8, 4)").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT minhash_sig(123)").collect()
    }
  }
}
