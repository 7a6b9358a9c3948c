package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer/encoder against the classic Sennrich corpus with
  * hand-computed expected merges, plus encoder-trainer parity. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  // word frequencies: low×5, lower×2, newest×6, widest×3
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, ("low " * 5).trim),
      (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim),
      (4L, ("widest " * 3).trim))
      .toDF("doc_id", "text")
  }

  test("train: hand-computed merge sequence with deterministic tie-breaks") {
    // round 1: es=9 ties st=9 → (e,s) wins lexicographically
    // round 2: (es,t)=9 ; round 3: lo=7 ties ow=7 → lo
    // round 4: (lo,w)=7 ; round 5: ew=6 ties ne=6,(w,est)=6 → (e,w)
    val merges = Bpe.train(docs, "text", 5)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w")))
    assert(merges.map(_.merged) == Seq("es", "est", "lo", "low", "ew"))
    assert(merges.map(_.rank) == Seq(1, 2, 3, 4, 5))
  }

  test("size-gated local trainer == distributed trainer (merge-for-merge)") {
    // the round-20 driver-local fast path must be bit-identical to the
    // distributed loop it replaces at small scale: same counts, same
    // (cnt desc, l asc, r asc) tie-break, same rewrite, same early stop
    val wf = Bpe.wordFreq(docs, "text")
    val dist = Bpe.trainFromDistributed(wf, w => w.map(_.toString), 8)
    val local = Bpe.trainLocal(
      wf.collect().map(r => (r.getString(0), r.getLong(1))),
      w => w.map(_.toString), 8)
    assert(local == dist)
    // byte-level alphabet too (space → 'Ġ' symbols exercise the
    // above-ASCII comparison path in the local argmax)
    val pf = Bpe.pretokenFreq(docs, "text")
    val distB = Bpe.trainFromDistributed(pf, Bpe.byteSymbols, 8)
    val localB = Bpe.trainLocal(
      pf.collect().map(r => (r.getString(0), r.getLong(1))),
      Bpe.byteSymbols, 8)
    assert(localB == distB)
  }

  test("local tie-break is UTF-8 byte order: supplementary plane vs U+E000 (ADVICE r20)") {
    // U+E000 (private use, 3-byte UTF-8 EE 80 80) vs U+1D11E (musical G
    // clef, 4-byte UTF-8 F0 9D 84 9E). UTF-8 byte order: E000 < 1D11E;
    // Java UTF-16 code-unit order: 1D11E (high surrogate 0xD834) < E000.
    // On a count tie the distributed path (Spark UTF8String sort) picks
    // the E000 pair — the local argmax must agree.
    import spark.implicits._
    val clef = new String(Character.toChars(0x1D11E))
    val pua = "\uE000"
    val wf = Seq((pua + pua, 3L), (clef + clef, 3L)).toDF("w", "f")
    val symsOf: String => Seq[String] =
      w => w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp)))
    val dist = Bpe.trainFromDistributed(wf, symsOf, 1)
    val local = Bpe.trainLocal(
      wf.collect().map(r => (r.getString(0), r.getLong(1))), symsOf, 1)
    assert(dist.map(m => (m.left, m.right)) == Seq((pua, pua)))
    assert(local == dist)
  }

  test("train stops early when no pair repeats") {
    import spark.implicits._
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once → zero merges (cnt < 2 stops training)
    assert(Bpe.train(tiny, "text", 10).isEmpty)
  }

  test("round-1 pair counts match the hand computation") {
    val cnts = Bpe.round1PairCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnts("es") == 9L && cnts("st") == 9L && cnts("lo") == 7L &&
      cnts("ow") == 7L && cnts("we") == 8L && cnts("ne") == 6L)
  }

  test("byte mapping: GPT-2 bytes_to_unicode spot values + reversibility") {
    // printable ASCII keeps itself; space (0x20) is the 33rd remapped byte
    // counting from 0x00 → 0x100 + 0x20 = 'Ġ'; newline 0x0A → 'Ċ' (0x10A);
    // high bytes in the kept Latin-1 ranges keep themselves
    assert(Bpe.ByteToChar(0x61) == 'a' && Bpe.ByteToChar(0x7e) == '~')
    assert(Bpe.ByteToChar(0x20) == 'Ġ') // Ġ
    assert(Bpe.ByteToChar(0x0a) == 'Ċ') // Ċ
    assert(Bpe.ByteToChar(0xa9) == '©' && Bpe.ByteToChar(0xff) == 'ÿ')
    assert(Bpe.ByteToChar.distinct.length == 256) // bijection
  }

  test("byte fallback: multi-byte UTF-8 decomposes to mapped byte symbols") {
    // 'é' = 0xC3 0xA9; both bytes are in kept ranges → 'Ã', '©'
    assert(Bpe.byteSymbols("é") == Seq("Ã", "©"))
    assert(Bpe.byteSymbols(" ab") == Seq("Ġ", "a", "b"))
  }

  test("byte-level pretokenizer: leading spaces attach, runs split by class") {
    val re = Bpe.BytePretokenPattern.r
    assert(re.findAllIn("hello world 42!").toSeq ==
      Seq("hello", " world", " 42", "!"))
    assert(re.findAllIn("it's fine").toSeq == Seq("it", "'s", " fine"))
  }

  test("byte-level train: hand-computed merge sequence on 'aa aa'") {
    import spark.implicits._
    val tiny = Seq((1L, "aa aa")).toDF("doc_id", "text")
    // pretokens: 'aa' (1), ' aa' (1) → pair (a,a) cnt 2, (Ġ,a) cnt 1
    // round 1 merges (a,a); then no pair reaches 2 → stop
    val merges = Bpe.trainByteLevel(tiny, "text", 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "a")))
    val out = Bpe.tokenizeByteLevel(tiny, "doc_id", "text", merges).collect()
    assert(out.head.getSeq[String](1) == Seq("aa", "Ġ", "aa"))
  }

  test("byte-level decode is a total inverse: unicode, supplementary plane, whitespace") {
    import spark.implicits._
    // accents (2-byte UTF-8), CJK (3-byte), an emoji (4-byte,
    // supplementary plane), tabs/newlines — decode must reproduce the
    // pretoken concatenation byte-for-byte
    val texts = Seq("héllo wörld", "日本語 テスト", "mix 🎉 2024!", "a\tb\nc  d", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.trainByteLevel(df, "text", 8)
    val decoded = Bpe.detokenizeByteLevel(
      Bpe.tokenizeByteLevel(df, "doc_id", "text", merges), "doc_id", "tokens")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val re = Bpe.BytePretokenPattern.r
    texts.zipWithIndex.foreach { case (t, i) =>
      val expect = re.findAllIn(t.toLowerCase).mkString
      assert(decoded(i.toLong) == expect, s"round trip failed on '$t'")
    }
    // the visible-alphabet inverse is total over all 256 bytes
    assert((0 to 255).forall(b => Bpe.CharToByte(Bpe.ByteToChar(b)) == b.toByte))
  }

  test("encode parity: in-vocab words reproduce trained symbolization; OOV decomposes") {
    import spark.implicits._
    val merges = Bpe.train(docs, "text", 5)
    // lowest: l o w e s t → es → est → lo → low → [low, est]
    assert(Bpe.encodeWord("lowest", merges) == Seq("low", "est"))
    assert(Bpe.encodeWord("lower", merges) == Seq("low", "e", "r"))
    assert(Bpe.encodeWord("newest", merges) == Seq("n", "ew", "est"))
    // tokenize: mapPartitions path, round-trip concat reconstructs words
    val out = Bpe.tokenize(Seq((9L, "Lowest NEWEST zz")).toDF("doc_id", "text"),
      "doc_id", "text", merges).collect()
    val toks = out.head.getSeq[String](1)
    assert(toks == Seq("low", "est", "n", "ew", "est", "z", "z"))
    assert(toks.mkString == "lowestnewestzz")
  }
}
