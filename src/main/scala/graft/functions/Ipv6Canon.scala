package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv6 canonicalization — the engine's pinned `parse_ipv6` subset as ONE
  * native pass (this replaces a ~15-site regex-heavy Column tree whose
  * Catalyst analysis + janino compile dominated the ipv6 ring at ~2.5 s
  * of FIXED cost per query; the per-row work also drops from eight
  * regexp_extract calls to a single string walk).
  *
  * The semantics replicate the retired Column expression EXACTLY —
  * KqlCompilerSpec's parse_ipv6 vectors and the q163/q224/q226 oracles
  * pin them:
  *  - lower(trim(input));
  *  - embedded dotted-IPv4 tail `…:a.b.c.d` (at least one colon before
  *    the quad, quad anchored at end): rewritten to its two 16-bit hex
  *    groups when every octet ≤ 255 (leading-zero octets accepted here,
  *    matching the Column cast); otherwise the text passes through and
  *    fails the shape check → null, the same loudly-null stance as zone
  *    suffixes (`fe80::1%eth0`);
  *  - shape: `^[0-9a-f:]+$`, at most 2 non-overlapping `::`-split parts;
  *  - `::` gap: left of the FIRST `::`, right of the LAST `::` (the
  *    substring_index pair), non-empty `:`-groups, gap filled with
  *    max(8 − left − right, 0) zero groups;
  *  - no gap → exactly 8 groups; total must be 8; each group ≤ 4 chars;
  *  - output: zero-padded 4-hex groups joined by ':'.
  */
object Ipv6CanonOps extends Serializable {
  private val V4Tail = java.util.regex.Pattern.compile(
    "^[0-9a-f:]*:([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$")
  private val Shape = java.util.regex.Pattern.compile("^[0-9a-f:]+$")

  def canonical(in: UTF8String): UTF8String = {
    var s = in.toString.trim.toLowerCase(java.util.Locale.ROOT)
    if (s.indexOf('.') >= 0) {
      val m = V4Tail.matcher(s)
      if (m.matches()) {
        val o1 = m.group(1).toInt; val o2 = m.group(2).toInt
        val o3 = m.group(3).toInt; val o4 = m.group(4).toInt
        if (o1 <= 255 && o2 <= 255 && o3 <= 255 && o4 <= 255) {
          val quadLen = m.group(1).length + m.group(2).length +
            m.group(3).length + m.group(4).length + 3
          s = s.substring(0, s.length - quadLen) +
            f"${o1 * 256 + o2}%04x:${o3 * 256 + o4}%04x"
        }
      }
    }
    if (!Shape.matcher(s).matches()) return null
    if (s.split("::", -1).length > 2) return null
    val gap = s.indexOf("::")
    val (leftStr, rightStr) =
      if (gap >= 0) (s.substring(0, gap), s.substring(s.lastIndexOf("::") + 2))
      else (s, "")
    def groups(p: String): Array[String] = p.split(":", -1).filter(_.nonEmpty)
    val l = groups(leftStr); val r = groups(rightStr)
    if (gap < 0 && l.length != 8) return null
    val mid = if (gap >= 0) math.max(8 - l.length - r.length, 0) else 0
    val all = l ++ Array.fill(mid)("0") ++ r
    if (all.length != 8) return null
    var i = 0
    while (i < 8) { if (all(i).length > 4) return null; i += 1 }
    val sb = new java.lang.StringBuilder(39)
    i = 0
    while (i < 8) {
      if (i > 0) sb.append(':')
      var p = all(i).length
      while (p < 4) { sb.append('0'); p += 1 }
      sb.append(all(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class Ipv6Canonical(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("parse_ipv6", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    Ipv6CanonOps.canonical(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Ipv6CanonOps.canonical($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Ipv6Canonical =
    copy(child = newChild)
}
