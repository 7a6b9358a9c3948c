package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch — the mergeable heavy-hitter/frequency sketch that
  * completes the sketch family next to HLL (distincts), the quantile
  * log-histogram (percentiles), and bloom (membership). `cm_sketch(x)`
  * aggregates raw values, `cm_merge(sk)` re-aggregates stored sketches
  * (the two-level rollup path), `cm_estimate(sk, v)` reads a frequency,
  * `cm_total(sk)` the stream length.
  *
  * Pinned spec (deterministic; the gate checks the CONTRACT — true ≤
  * estimate ≤ true + 2%·N — not sketch bytes, the q104 HLL stance):
  *  - depth d = 4, width w = 256 (ε = e/w ≈ 1.06%, δ = e⁻⁴ ≈ 1.8%);
  *  - row j hashes the value's UTF-8 bytes with xxhash64(seed = j),
  *    column = floorMod(h, w) — engine-stable, partition-insensitive;
  *  - merge is elementwise count addition (exact, order-insensitive);
  *  - serialized form is canonical JSON
  *    `{"d":4,"w":256,"n":N,"r":[[256 longs] × 4]}` — byte-identical
  *    across runs/partitionings, so sketches are storable/joinable.
  *
  * State is a FIXED 4×256 long array (8 KB) per group regardless of
  * stream length — the 100 TB property: frequency questions over
  * arbitrary cardinality cost O(1) memory per group, and per-shard
  * sketches roll up by addition without touching raw data again. */
object CountMinOps {
  val Depth = 4
  val Width = 256

  final class Buf(val rows: Array[Long], var n: Long) // rows: Depth*Width
  def empty(): Buf = new Buf(new Array[Long](Depth * Width), 0L)

  private def col(v: UTF8String, j: Int): Int = {
    val h = XXH64.hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes, j.toLong)
    java.lang.Math.floorMod(h, Width.toLong).toInt
  }

  def add(b: Buf, v: UTF8String): Unit = {
    var j = 0
    while (j < Depth) {
      b.rows(j * Width + col(v, j)) += 1L
      j += 1
    }
    b.n += 1L
  }

  def mergeIn(b: Buf, o: Buf): Unit = {
    var i = 0
    while (i < Depth * Width) { b.rows(i) += o.rows(i); i += 1 }
    b.n += o.n
  }

  def estimate(b: Buf, v: UTF8String): Long = {
    var m = Long.MaxValue
    var j = 0
    while (j < Depth) {
      val c = b.rows(j * Width + col(v, j))
      if (c < m) m = c
      j += 1
    }
    m
  }

  def toJson(b: Buf): String = {
    val sb = new java.lang.StringBuilder(4096)
    sb.append("{\"d\":").append(Depth).append(",\"w\":").append(Width)
      .append(",\"n\":").append(b.n).append(",\"r\":[")
    var j = 0
    while (j < Depth) {
      if (j > 0) sb.append(',')
      sb.append('[')
      var i = 0
      while (i < Width) {
        if (i > 0) sb.append(',')
        sb.append(b.rows(j * Width + i))
        i += 1
      }
      sb.append(']')
      j += 1
    }
    sb.append("]}").toString
  }

  def fromJson(s: String): Buf = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(s)
    val b = empty()
    if (root == null || !root.isObject) return b
    // A sketch built with different parameters is NOT mergeable with
    // this family (row hashes disagree) — reject loudly rather than
    // silently misreading counts.
    val d = root.path("d").asInt(Depth)
    val w = root.path("w").asInt(Width)
    if (d != Depth || w != Width)
      throw new IllegalArgumentException(
        s"count-min sketch parameter mismatch: expected d=$Depth w=$Width, got d=$d w=$w")
    b.n = root.path("n").asLong(0L)
    val r = root.path("r")
    var j = 0
    while (j < Depth && j < r.size()) {
      val row = r.get(j)
      var i = 0
      while (i < Width && i < row.size()) {
        b.rows(j * Width + i) = row.get(i).asLong()
        i += 1
      }
      j += 1
    }
    b
  }

  /** READ-path parse memo: a per-thread LRU of the last few parsed
    * sketches, keyed by the serialized JSON. A scan that estimates
    * against a joined sketch column sees the SAME handful of 8 KB
    * strings on every row (one per group key) — without the memo each
    * row re-ran a full Jackson parse (and allocated a fresh
    * ObjectMapper). Cached Bufs are READ-ONLY by contract: only
    * estimate()/n reads — never hand one to mergeIn/add (the aggregate
    * paths parse uncached for that reason). */
  private val parseMemo = new ThreadLocal[java.util.LinkedHashMap[String, Buf]] {
    override def initialValue() =
      new java.util.LinkedHashMap[String, Buf](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Buf]): Boolean =
          size() > 8
      }
  }
  def fromJsonCached(s: String): Buf = {
    val c = parseMemo.get()
    var b = c.get(s)
    if (b == null) { b = fromJson(s); c.put(s, b) }
    b
  }

  def serialize(b: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (Depth * Width + 1))
    bb.putLong(b.n)
    var i = 0
    while (i < Depth * Width) { bb.putLong(b.rows(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = empty()
    b.n = bb.getLong()
    var i = 0
    while (i < Depth * Width) { b.rows(i) = bb.getLong(); i += 1 }
    b
  }
}

/** `cm_sketch(x)` — build the count-min sketch from raw (string) values. */
case class CmSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinOps.Buf] {
  import CountMinOps._
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cm_sketch expects a string column, got ${child.dataType}")
  override def createAggregationBuffer(): Buf = empty()
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) add(b, v.asInstanceOf[UTF8String])
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { mergeIn(b, o); b }
  override def eval(b: Buf): Any = UTF8String.fromString(toJson(b))
  override def serialize(b: Buf): Array[Byte] = CountMinOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): Buf = CountMinOps.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmSketchAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmSketchAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmSketchAgg =
    copy(child = c.head)
}

/** `cm_merge(sk)` — re-aggregate serialized sketches (exact addition). */
case class CmMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinOps.Buf] {
  import CountMinOps._
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cm_merge expects a sketch string column, got ${child.dataType}")
  override def createAggregationBuffer(): Buf = empty()
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) mergeIn(b, fromJson(v.toString))
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { mergeIn(b, o); b }
  override def eval(b: Buf): Any = UTF8String.fromString(toJson(b))
  override def serialize(b: Buf): Array[Byte] = CountMinOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): Buf = CountMinOps.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmMergeAgg =
    copy(child = c.head)
}

/** `cm_estimate(sk, v)` — min over the depth rows (runs on aggregated
  * rows, so CodegenFallback costs nothing measurable). */
case class CmEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, v: Any): Any =
    CountMinOps.estimate(CountMinOps.fromJsonCached(sketch.toString),
      v match {
        case u: UTF8String => u
        case other => UTF8String.fromString(String.valueOf(other))
      })
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cm_estimate expects a sketch string, got ${left.dataType}")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmEstimate =
    copy(left = l, right = r)
}

/** `cm_total(sk)` — the sketch's stream length N. */
case class CmTotal(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sketch: Any): Any =
    CountMinOps.fromJsonCached(sketch.toString).n
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cm_total expects a sketch string, got ${child.dataType}")
  override protected def withNewChildInternal(newChild: Expression): CmTotal =
    copy(child = newChild)
}
