package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the zlib/gzip base64 codec bridge after the round-20 native-
  * hygiene rewrite (per-thread reused zlib codecs, deterministically
  * ended gzip codecs — the old per-row `new` + never-`end()` leaked
  * ~0.5 MB of native zlib buffers per call):
  *
  *  - zlib compressed bytes stay EXACTLY the golden level-6 stream the
  *    q203 oracle compares (zlib output is canonical per level, so a
  *    codec change that altered bytes would silently shift the gate);
  *  - round-trips are identity for both codecs, including repeated
  *    calls on one thread (the reset() discipline);
  *  - malformed/truncated input → null, never a throw.
  */
class CompressionCodecSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  test("zlib compress matches the golden level-6 stream and round-trips") {
    // 'click payload' compressed by python zlib.compress(level=6) — the
    // same golden family as the q203 literals.
    val zc = TextHash.zlibCompressB64(u("click payload"))
    assert(zc.toString == "eJxLzslMzlYoSKzMyU9MAQAjHgUR")
    assert(TextHash.zlibDecompressB64(zc).toString == "click payload")
  }

  test("gzip round-trips and decodes the golden java stream") {
    val in = "purchase payload"
    val rt = TextHash.gzipDecompressB64(TextHash.gzipCompressB64(u(in)))
    assert(rt.toString == in)
    assert(TextHash.gzipDecompressB64(
      u("H4sIAAAAAAAAA0vOyUzOVihIrMzJT0wBABEOXHgNAAAA")).toString == "click payload")
  }

  test("reused per-thread codecs stay correct across many calls") {
    (1 to 200).foreach { i =>
      val s = "payload " * (i % 17 + 1) + i
      assert(TextHash.zlibDecompressB64(TextHash.zlibCompressB64(u(s))).toString == s)
      assert(TextHash.gzipDecompressB64(TextHash.gzipCompressB64(u(s))).toString == s)
    }
  }

  test("malformed and truncated input decompress to null") {
    assert(TextHash.zlibDecompressB64(u("not-base64!!")) == null)
    assert(TextHash.gzipDecompressB64(u("not-base64!!")) == null)
    // valid base64, garbage bytes
    assert(TextHash.zlibDecompressB64(u("AAAA")) == null)
    assert(TextHash.gzipDecompressB64(u("AAAA")) == null)
    // truncated but well-formed prefix of a real zlib stream
    val full = TextHash.zlibCompressB64(u("click payload")).toString
    val cut = java.util.Base64.getEncoder.encodeToString(
      java.util.Base64.getDecoder.decode(full).dropRight(4))
    assert(TextHash.zlibDecompressB64(u(cut)) == null)
    assert(TextHash.zlibDecompressB64(u("")) == null ||
      TextHash.zlibDecompressB64(u("")).toString.isEmpty)
  }
}
