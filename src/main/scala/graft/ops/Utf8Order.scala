package graft.ops

/** UTF-8 byte-order string comparison — the ordering Spark gives string
  * columns (UTF8String binary order in sorts, min/max, tuple orderings).
  * Java String's natural order is UTF-16 code-unit order, which diverges
  * from UTF-8 byte order exactly when a supplementary-plane character
  * (surrogate pair, UTF-16 units 0xD800–0xDFFF) competes with a BMP
  * character in U+E000–U+FFFF. Every driver-local kernel that replays a
  * distributed tie-break on strings must compare with THIS ordering for
  * bit-identical local/distributed parity (BPE argmax, graph-component
  * min-id labels, BFS path signatures).
  */
object Utf8Order extends Ordering[String] {
  override def compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
