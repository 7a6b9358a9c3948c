package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ipv4_range_to_cidr_list(start, end)` — the minimal list of CIDR
  * blocks exactly covering the inclusive address range: the standard
  * greedy split (at each step emit the largest power-of-two block that
  * is both alignment-compatible with the current start and fits within
  * the remaining range). ≤ 64 blocks for any range (two per prefix
  * length), so the output is bounded. Malformed addresses or
  * start > end → null. */
object Ipv4Cidr {
  private def parse(s: String): Long = {
    val parts = s.trim.split("\\.", -1)
    if (parts.length != 4) return -1L
    var v = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      // ASCII digits only — Char.isDigit accepts Unicode digit classes
      // (e.g. Arabic-Indic), which the ipv4 family rejects
      if (p.isEmpty || p.length > 3 || !p.forall(c => c >= '0' && c <= '9')) return -1L
      // leading-zero octets ('01.2.3.4') are rejected, matching Kusto
      // (and avoiding the octal-interpretation ambiguity CVEs)
      if (p.length > 1 && p.charAt(0) == '0') return -1L
      val o = p.toInt
      if (o > 255) return -1L
      v = (v << 8) | o
      i += 1
    }
    v
  }
  private def fmt(v: Long): String =
    s"${(v >> 24) & 255}.${(v >> 16) & 255}.${(v >> 8) & 255}.${v & 255}"

  def rangeToCidrs(startS: UTF8String, endS: UTF8String): ArrayData = {
    var start = parse(startS.toString)
    val end = parse(endS.toString)
    if (start < 0 || end < 0 || start > end) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (start <= end) {
      // largest block: limited by start's alignment and the remaining span
      var size = start & -start // lowest set bit; 0 (start=0) → full range
      if (size == 0) size = 1L << 32
      while (size > end - start + 1) size >>= 1
      val prefix = 32 - java.lang.Long.numberOfTrailingZeros(size)
      out += UTF8String.fromString(s"${fmt(start)}/$prefix")
      start += size
    }
    new GenericArrayData(out.toArray)
  }
}

case class Ipv4RangeToCidrList(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("ipv4_range_to_cidr_list", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("ipv4_range_to_cidr_list", right)
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Ipv4Cidr.rangeToCidrs(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.Ipv4Cidr.rangeToCidrs($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Ipv4RangeToCidrList =
    copy(left = l, right = r)
}
