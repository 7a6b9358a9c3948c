package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kusto property-bag mutators over this engine's dynamic (JSON text),
  * TYPE-PRESERVING via Jackson (already on the Spark classpath — the
  * same parser Spark's JSON datasource uses). A from_json round-trip
  * through `map<string,string>` would stringify numbers/booleans/nested
  * values; these keep the original value nodes intact.
  *
  * Pinned semantics:
  *  - `bag_merge(b1, b2, …)`: left-to-right; the FIRST bag that defines
  *    a key wins (Kusto rule). Key order = first-occurrence order
  *    (Jackson ObjectNode preserves insertion order — deterministic).
  *  - `bag_remove_keys(bag, keys)`: removes TOP-LEVEL keys listed in
  *    the JSON-array argument (documented subset: no path removal).
  *  - `bag_set_key(bag, key, value)`: sets a top-level key; the value
  *    (dynamic JSON text) is parsed as JSON when well-formed, else
  *    stored as a JSON string.
  *  - any non-object bag input → null (exception-total).
  */
object JsonBagOps extends Serializable {
  import com.fasterxml.jackson.databind.ObjectMapper
  import com.fasterxml.jackson.databind.node.ObjectNode

  private val mappers = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }

  private def obj(m: ObjectMapper, s: UTF8String): ObjectNode =
    m.readTree(s.toString) match {
      case o: ObjectNode => o
      case _ => null
    }

  /** dynamic_to_json: canonical serialization — object keys sorted
    * recursively at every level (Kusto's documented normalization);
    * arrays keep element order; non-JSON input serializes as a JSON
    * string (a bare scalar IS a dynamic value). */
  def dynamicToJson(s: UTF8String): UTF8String =
    try {
      val m = mappers.get
      val node =
        try m.readTree(s.toString)
        catch { case scala.util.control.NonFatal(_) => null }
      if (node == null || node.isMissingNode)
        UTF8String.fromString(m.writeValueAsString(s.toString))
      else UTF8String.fromString(m.writeValueAsString(sortKeys(m, node)))
    } catch { case scala.util.control.NonFatal(_) => null }

  private def sortKeys(m: ObjectMapper,
      n: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = n match {
    case o: ObjectNode =>
      val out = m.createObjectNode()
      val it = o.fieldNames()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) names += it.next()
      names.sorted.foreach(k => out.set[com.fasterxml.jackson.databind.JsonNode](k, sortKeys(m, o.get(k))))
      out
    case a: com.fasterxml.jackson.databind.node.ArrayNode =>
      val out = m.createArrayNode()
      val it = a.elements()
      while (it.hasNext) out.add(sortKeys(m, it.next()))
      out
    case other => other
  }

  def bagMerge(a: UTF8String, b: UTF8String): UTF8String =
    try {
      val m = mappers.get
      val oa = obj(m, a); val ob = obj(m, b)
      if (oa == null || ob == null) null
      else {
        val out = oa.deepCopy()
        val it = ob.fieldNames()
        while (it.hasNext) {
          val k = it.next()
          if (!out.has(k)) out.set(k, ob.get(k))
        }
        UTF8String.fromString(m.writeValueAsString(out))
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  def bagRemoveKeys(bag: UTF8String, keys: UTF8String): UTF8String =
    try {
      val m = mappers.get
      val o = obj(m, bag)
      val ks = m.readTree(keys.toString)
      if (o == null || !ks.isArray) null
      else {
        val out = o.deepCopy()
        ks.forEach(k => out.remove(k.asText()))
        UTF8String.fromString(m.writeValueAsString(out))
      }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** treepath(bag): every path expression in the dynamic value, Kusto's
    * documented form — object members append `['key']`, array elements
    * collapse to ONE generic `[0]` indexer (the doc's
    * `['listProperty'][0]['x']` example), every intermediate node
    * contributes its own path. Depth-first document order; duplicate
    * paths (several array elements with the same member) keep the first
    * occurrence. A bare scalar has no paths → empty array; malformed
    * JSON → null. */
  def treepath(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = mappers.get
    val root =
      try m.readTree(s.toString)
      catch { case scala.util.control.NonFatal(_) => return null }
    if (root == null || root.isMissingNode) return null
    val out = new java.util.LinkedHashSet[UTF8String]()
    def walk(n: com.fasterxml.jackson.databind.JsonNode, path: String): Unit = {
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = path + "['" + e.getKey + "']"
          out.add(UTF8String.fromString(p))
          walk(e.getValue, p)
        }
      } else if (n.isArray && n.size() > 0) {
        val p = path + "[0]"
        out.add(UTF8String.fromString(p))
        var i = 0
        while (i < n.size()) { walk(n.get(i), p); i += 1 }
      }
    }
    walk(root, "")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }

  def bagSetKey(bag: UTF8String, key: UTF8String, value: UTF8String): UTF8String =
    try {
      val m = mappers.get
      val o = obj(m, bag)
      if (o == null) null
      else {
        val out = o.deepCopy()
        val parsed =
          try m.readTree(value.toString)
          catch { case scala.util.control.NonFatal(_) => null }
        val v: com.fasterxml.jackson.databind.JsonNode =
          if (parsed == null || parsed.isMissingNode)
            com.fasterxml.jackson.databind.node.TextNode.valueOf(value.toString)
          else parsed
        out.set(key.toString, v)
        UTF8String.fromString(m.writeValueAsString(out))
      }
    } catch { case scala.util.control.NonFatal(_) => null }
}

/** buildschema() support: per-value dynamic schemas and their
  * conflict-aware merge. Pinned rules (the evaluate schema_merge
  * stance — conflicts surface, never silently coerce):
  *  - schemaOf: object → object of member schemas (recursive); array →
  *    single-element array of the FIRST element's schema (empty array →
  *    []); scalars → "string"/"bool"/"long"/"real"/"null"; non-JSON
  *    text IS a string value → "string".
  *  - merge: object∪object unions keys and recurses; arrays merge
  *    their element schema; equal leaves stay; ANYTHING else →
  *    "conflict". Commutative and associative (conflict absorbs), so
  *    the fold order never shows. */
object SchemaOps extends Serializable {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}

  private val mappers = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }
  /** Merge identity — resolves to the other side. */
  val Empty = "\"__graft_empty\""

  private def schemaOf(m: ObjectMapper, n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = m.createObjectNode()
      val it = o.fieldNames()
      while (it.hasNext) { val k = it.next(); out.set[JsonNode](k, schemaOf(m, o.get(k))) }
      out
    case a: ArrayNode =>
      val out = m.createArrayNode()
      if (a.size() > 0) out.add(schemaOf(m, a.get(0)))
      out
    case t if t.isTextual => TextNode.valueOf("string")
    case b if b.isBoolean => TextNode.valueOf("bool")
    case i if i.isIntegralNumber => TextNode.valueOf("long")
    case d if d.isNumber => TextNode.valueOf("real")
    case _ => TextNode.valueOf("null")
  }

  def dynamicSchema(s: UTF8String): UTF8String =
    try {
      val m = mappers.get
      val node =
        try m.readTree(s.toString)
        catch { case scala.util.control.NonFatal(_) => null }
      if (node == null || node.isMissingNode)
        UTF8String.fromString("\"string\"")
      else UTF8String.fromString(m.writeValueAsString(schemaOf(m, node)))
    } catch { case scala.util.control.NonFatal(_) => null }

  private def merge(m: ObjectMapper, a: JsonNode, b: JsonNode): JsonNode = (a, b) match {
    case (t: TextNode, _) if t.textValue() == "__graft_empty" => b
    case (_, t: TextNode) if t.textValue() == "__graft_empty" => a
    case (oa: ObjectNode, ob: ObjectNode) =>
      val out = m.createObjectNode()
      val keys = scala.collection.mutable.TreeSet.empty[String]
      val ia = oa.fieldNames(); while (ia.hasNext) keys += ia.next()
      val ib = ob.fieldNames(); while (ib.hasNext) keys += ib.next()
      keys.foreach { k =>
        val va = oa.get(k); val vb = ob.get(k)
        out.set[JsonNode](k,
          if (va == null) vb else if (vb == null) va else merge(m, va, vb))
      }
      out
    case (aa: ArrayNode, ab: ArrayNode) =>
      val out = m.createArrayNode()
      if (aa.size() == 0) { if (ab.size() > 0) out.add(ab.get(0)) }
      else if (ab.size() == 0) out.add(aa.get(0))
      else out.add(merge(m, aa.get(0), ab.get(0)))
      out
    case _ => if (a == b) a else TextNode.valueOf("conflict")
  }

  def schemaMergeBags(a: UTF8String, b: UTF8String): UTF8String =
    try {
      val m = mappers.get
      UTF8String.fromString(m.writeValueAsString(
        merge(m, m.readTree(a.toString), m.readTree(b.toString))))
    } catch { case scala.util.control.NonFatal(_) => null }
}

case class DynamicSchema(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("buildschema", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    SchemaOps.dynamicSchema(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SchemaOps.dynamicSchema($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): DynamicSchema =
    copy(child = newChild)
}

case class SchemaMergeBags(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("schema merge", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("schema merge", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SchemaOps.schemaMergeBags(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.SchemaOps.schemaMergeBags($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SchemaMergeBags =
    copy(left = l, right = r)
}

case class DynamicToJson(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("dynamic_to_json", child)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    JsonBagOps.dynamicToJson(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonBagOps.dynamicToJson($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): DynamicToJson =
    copy(child = newChild)
}

case class Treepath(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TypeGuards.requireString("treepath", child)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    JsonBagOps.treepath(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonBagOps.treepath($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): Treepath =
    copy(child = newChild)
}

case class BagMerge(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("bag_merge", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("bag_merge", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JsonBagOps.bagMerge(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.JsonBagOps.bagMerge($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BagMerge =
    copy(left = l, right = r)
}

case class BagRemoveKeys(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = TypeGuards.requireString("bag_remove_keys", left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else TypeGuards.requireString("bag_remove_keys", right)
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    JsonBagOps.bagRemoveKeys(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.JsonBagOps.bagRemoveKeys($a, $b);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BagRemoveKeys =
    copy(left = l, right = r)
}

case class BagSetKey(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    children.view.map(TypeGuards.requireString("bag_set_key", _))
      .find(_ != TypeCheckResult.TypeCheckSuccess)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    JsonBagOps.bagSetKey(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      c.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = graft.functions.JsonBagOps.bagSetKey($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): BagSetKey =
    copy(first = a, second = b, third = c)
}
