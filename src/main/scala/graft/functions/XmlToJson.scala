package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kusto `parse_xml()` — XML text → dynamic (this engine's dynamic IS
  * JSON text), as one native codegen'd expression.
  *
  * Pinned mapping (Kusto's documented element→bag conversion,
  * determinized):
  *  - the document becomes `{rootName: value(root)}`;
  *  - an element with no attributes and no child elements becomes its
  *    trimmed text (JSON string), or `null` when empty (`<e/>`);
  *  - otherwise an object: attributes first as `"@name"` keys (document
  *    order as exposed by the JDK DOM), then child elements grouped by
  *    name in first-occurrence order — a repeated name becomes an ARRAY
  *    in document order — and finally any non-empty trimmed text under
  *    `"#text"`;
  *  - all leaf values serialize as JSON strings (Kusto keeps XML text
  *    as text — no number sniffing);
  *  - malformed XML → null (exception-total, like the decode family).
  *
  * The parser is the JDK DOM with DTDs disallowed and external
  * entities disabled (no XXE — same hardening stance as the endpoint
  * validator), factory cached per thread like the Deflater.
  */
object XmlOps extends Serializable {
  private val builders = new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
    override def initialValue(): javax.xml.parsers.DocumentBuilder = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      f.setXIncludeAware(false)
      f.setExpandEntityReferences(false)
      f.newDocumentBuilder()
    }
  }

  private def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case ch if ch < ' ' => sb.append(f"\\u${ch.toInt}%04x")
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.append('"')
  }

  private def writeElement(sb: java.lang.StringBuilder, e: org.w3c.dom.Element): Unit = {
    import org.w3c.dom.Node
    val attrs = e.getAttributes
    val kids = e.getChildNodes
    val childElems = new java.util.ArrayList[org.w3c.dom.Element]()
    val text = new java.lang.StringBuilder
    var i = 0
    while (i < kids.getLength) {
      kids.item(i) match {
        case el: org.w3c.dom.Element => childElems.add(el)
        case t if t.getNodeType == Node.TEXT_NODE || t.getNodeType == Node.CDATA_SECTION_NODE =>
          text.append(t.getNodeValue)
        case _ => ()
      }
      i += 1
    }
    val txt = text.toString.trim
    if (attrs.getLength == 0 && childElems.isEmpty) {
      if (txt.isEmpty) sb.append("null") else esc(sb, txt)
      return
    }
    sb.append('{')
    var first = true
    def comma(): Unit = { if (!first) sb.append(','); first = false }
    i = 0
    while (i < attrs.getLength) {
      val a = attrs.item(i)
      comma(); esc(sb, "@" + a.getNodeName); sb.append(':'); esc(sb, a.getNodeValue)
      i += 1
    }
    // group child elements by name, first-occurrence order
    val names = new java.util.LinkedHashMap[String, java.util.ArrayList[org.w3c.dom.Element]]()
    childElems.forEach { el =>
      names.computeIfAbsent(el.getNodeName, _ => new java.util.ArrayList()).add(el)
    }
    names.forEach { (name, els) =>
      comma(); esc(sb, name); sb.append(':')
      if (els.size == 1) writeElement(sb, els.get(0))
      else {
        sb.append('[')
        var j = 0
        while (j < els.size) {
          if (j > 0) sb.append(',')
          writeElement(sb, els.get(j))
          j += 1
        }
        sb.append(']')
      }
    }
    if (txt.nonEmpty) { comma(); esc(sb, "#text"); sb.append(':'); esc(sb, txt) }
    sb.append('}')
  }

  /** Null (not an exception) on malformed input. */
  def xmlToJson(xml: UTF8String): UTF8String =
    try {
      val doc = builders.get.parse(
        new java.io.ByteArrayInputStream(xml.getBytes))
      val root = doc.getDocumentElement
      val sb = new java.lang.StringBuilder
      sb.append('{')
      esc(sb, root.getNodeName); sb.append(':')
      writeElement(sb, root)
      sb.append('}')
      UTF8String.fromString(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => null }
}

case class XmlToJson(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("parse_xml", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    XmlOps.xmlToJson(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "graft.functions.XmlOps"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.xmlToJson($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }
  override protected def withNewChildInternal(newChild: Expression): XmlToJson =
    copy(child = newChild)
}
