package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Greedy longest-match-first inference pins (vocab handed in directly;
  * the data-scale vocab selection + segmentation is oracle-gated by
  * q189's recursive-CTE replica). */
class WordPieceSpec extends AnyFunSuite {

  test("longest match wins at every cursor, classes respected") {
    val ini = Set("u", "n", "un", "und")
    val cont = Set("a", "b", "l", "e", "d", "##ab".substring(2), "able", "ble")
    // "unable": initial tries und (no: 'una' != 'und' at len 3? greedy
    // checks the PREFIX) — und does not match "una…", un does
    assert(WordPiece.greedy("unable", ini, cont) == Seq("un", "##able"))
    // continuation prefers the longest: able over a+ble
    assert(WordPiece.greedy("unab", ini, cont) == Seq("un", "##ab"))
  }

  test("single-char fallback always succeeds on observed chars") {
    val ini = Set("x", "y")
    val cont = Set("x", "y")
    assert(WordPiece.greedy("xyx", ini, cont) == Seq("x", "##y", "##x"))
    assert(WordPiece.greedy("", ini, cont) == Seq.empty)
  }

  test("MaxPieceLen caps the match window") {
    val ini = Set("a", "abcd")
    val cont = Set("e", "bcde")
    // abcde: initial abcd (len 4 = cap), then continuation e
    assert(WordPiece.greedy("abcde", ini, cont) == Seq("abcd", "##e"))
  }
}
