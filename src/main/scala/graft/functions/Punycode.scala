package graft.functions

/** RFC 3492 Punycode (the IDNA bootstring parameters), implemented from
  * the published specification. Single-label encode/decode plus the
  * domain forms that apply the `xn--` ACE prefix per dot-separated
  * label. Pure JVM, no allocation beyond the output buffer — called
  * from codegen'd native expressions ([[PunycodeEncode]] etc.).
  *
  * Reference behavior cross-checked against RFC 3492 §7.1 sample
  * strings and Python's `punycode` codec (PunycodeSpec). */
object Punycode extends Serializable {
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitVal(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** Encode one label (RFC 3492 §6.3). Pure-ASCII input encodes to
    * `input + "-"` (basic string + delimiter), per the RFC. */
  def encode(input: String): String = {
    val cps = input.codePoints().toArray
    val sb = new StringBuilder
    cps.foreach(cp => if (cp < InitialN) sb.append(cp.toChar))
    val b = sb.length
    var h = b
    if (b > 0) sb.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(cp => if (cp >= n && cp < m) m = cp)
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { cp =>
        if (cp < n) delta += 1
        if (cp == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              sb.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          sb.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    sb.toString
  }

  /** Decode one label (RFC 3492 §6.2). Malformed input throws
    * IllegalArgumentException (callers surface null via try). */
  def decode(input: String): String = {
    val d = input.lastIndexOf('-')
    val out = new java.lang.StringBuilder
    val basicLen = math.max(d, 0)
    var bi = 0
    while (bi < basicLen) {
      val c = input.charAt(bi)
      if (c >= 128) throw new IllegalArgumentException("non-basic code point in basic portion")
      out.append(c)
      bi += 1
    }
    var pos = if (d >= 0) d + 1 else 0
    var i = 0
    var n = InitialN
    var bias = InitialBias
    var numPoints = basicLen
    while (pos < input.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (pos >= input.length)
          throw new IllegalArgumentException("truncated punycode")
        val digit = digitVal(input.charAt(pos))
        pos += 1
        if (digit < 0) throw new IllegalArgumentException("bad punycode digit")
        // RFC 3492 §6.4 overflow guards: a crafted/long label must fail
        // loudly (→ SQL null via the bridge), not wrap Int into a
        // wrong-but-valid string.
        try {
          i = Math.addExact(i, Math.multiplyExact(digit, w))
          val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
          if (digit < t) done = true
          else { w = Math.multiplyExact(w, Base - t); k += Base }
        } catch {
          case _: ArithmeticException =>
            throw new IllegalArgumentException("punycode overflow")
        }
      }
      numPoints += 1
      bias = adapt(i - oldi, numPoints, oldi == 0)
      n = try Math.addExact(n, i / numPoints) catch {
        case _: ArithmeticException =>
          throw new IllegalArgumentException("punycode overflow")
      }
      if (n > Character.MAX_CODE_POINT)
        throw new IllegalArgumentException("punycode overflow: code point out of range")
      i %= numPoints
      out.insert(charIndexOfCodePointIndex(out, i), Character.toChars(n))
      i += 1
    }
    out.toString
  }

  /** The decode buffer is UTF-16; insertion positions in the RFC are in
    * CODE POINTS — convert before inserting (supplementary-plane safe). */
  private def charIndexOfCodePointIndex(sb: java.lang.StringBuilder, cpIndex: Int): Int =
    sb.offsetByCodePoints(0, cpIndex)

  /** IDNA-style domain form: encode each dot label that has non-ASCII,
    * with the `xn--` ACE prefix; ASCII labels pass through. */
  def encodeDomain(s: String): String =
    s.split("\\.", -1).map { l =>
      if (l.codePoints().allMatch(cp => cp < InitialN)) l else "xn--" + encode(l)
    }.mkString(".")

  /** Inverse of [[encodeDomain]]: decode `xn--` labels, pass the rest. */
  def decodeDomain(s: String): String =
    s.split("\\.", -1).map { l =>
      val lower = l.toLowerCase(java.util.Locale.ROOT)
      if (lower.startsWith("xn--")) decode(l.substring(4)) else l
    }.mkString(".")

  // UTF8String bridges for the codegen'd expressions; decode failures
  // surface as SQL null, not a task-killing exception.
  def decodeU(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    try org.apache.spark.unsafe.types.UTF8String.fromString(decode(s.toString))
    catch { case _: IllegalArgumentException => null }

  def decodeDomainU(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    try org.apache.spark.unsafe.types.UTF8String.fromString(decodeDomain(s.toString))
    catch { case _: IllegalArgumentException => null }
}
