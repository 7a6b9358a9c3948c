package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Kusto's mergeable-percentile sketch surface — `tdigest()`,
  * `tdigest_merge()`/`merge_tdigest()`, `percentile_tdigest()` — PINNED
  * to a DDSketch-style relative-error log-histogram instead of an
  * actual t-digest. Rationale (documented determinization, same stance
  * as take_any→min): a t-digest's centroids depend on merge ORDER, so
  * two runs over differently-partitioned data yield different sketches;
  * a fixed-boundary log-histogram is ORDER-INSENSITIVE (bucket counts
  * are integer sums), so the sketch value — not just its estimates —
  * is reproducible across partitionings, retries, and cluster sizes,
  * and merge is exact bucket-count addition. Same guarantee class as
  * t-digest: relative error ≤ α per quantile estimate.
  *
  * Pinned spec (the DuckDB oracle replicates it):
  *  - α = 0.01, γ = (1+α)/(1−α) = 101/99;
  *  - bucket(x>0) = ceil(round(ln(x)/ln γ, 9)) — the 9dp rounding
  *    pins boundary values against sub-ulp libm differences across
  *    engines; negatives mirror into a second map; zeros (and
  *    sub-normal |x| < 1e-300) count separately;
  *  - estimate(bucket i) = (2/(γ+1))·γ^i (the geometric bucket
  *    midpoint); zero bucket → 0.0; negatives → −estimate;
  *  - percentile p: nearest-rank target = max(1, ceil(p/100·N)) walked
  *    in value order (negative buckets by descending index, zeros,
  *    positive ascending);
  *  - serialized form (the `dynamic` value) is canonical JSON
  *    `{"a":0.01,"z":Z,"n":[[i,c]…],"p":[[i,c]…]}` with buckets sorted
  *    by index — byte-identical across runs.
  *
  * State is bounded by the bucket span: ~2.3k buckets cover 1e-300 to
  * 1e300 at α=1%, so executor memory per group is O(kilobytes) no
  * matter how many rows stream through — the property that makes this
  * the 100 TB percentile path (exact `percentile()` sorts the group).
  */
object QuantileSketchOps {
  val Alpha = 0.01
  val Gamma: Double = (1 + Alpha) / (1 - Alpha)
  private val LnGamma = math.log(Gamma)

  final class Buf(
      var zero: Long,
      val pos: mutable.HashMap[Int, Long],
      val neg: mutable.HashMap[Int, Long]) {
    def add(x: Double, c: Long = 1L): Unit =
      if (java.lang.Double.isNaN(x)) ()
      else if (math.abs(x) < 1e-300) zero += c
      else {
        val m = if (x > 0) pos else neg
        val i = bucket(math.abs(x))
        m.update(i, m.getOrElse(i, 0L) + c)
      }
    def mergeIn(o: Buf): Unit = {
      zero += o.zero
      o.pos.foreach { case (i, c) => pos.update(i, pos.getOrElse(i, 0L) + c) }
      o.neg.foreach { case (i, c) => neg.update(i, neg.getOrElse(i, 0L) + c) }
    }
  }
  def empty(): Buf = new Buf(0L, mutable.HashMap.empty, mutable.HashMap.empty)

  def bucket(absX: Double): Int = {
    val r = math.log(absX) / LnGamma
    math.ceil(BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toInt
  }

  def estimate(i: Int): Double = 2.0 / (Gamma + 1) * math.pow(Gamma, i)

  def toJson(b: Buf): String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append("{\"a\":0.01,\"z\":").append(b.zero)
    def arr(name: String, m: mutable.HashMap[Int, Long]): Unit = {
      sb.append(",\"").append(name).append("\":[")
      val ks = m.keysIterator.toArray.sorted
      var first = true
      ks.foreach { k =>
        if (!first) sb.append(',')
        first = false
        sb.append('[').append(k).append(',').append(m(k)).append(']')
      }
      sb.append(']')
    }
    arr("n", b.neg); arr("p", b.pos)
    sb.append('}').toString
  }

  /** READ-path parse memo (the CountMinOps.fromJsonCached pattern): a
    * per-thread LRU keyed by the serialized JSON — a scan that reads a
    * joined sketch column sees the same handful of sketch strings on
    * every row. Cached Bufs are READ-ONLY by contract (percentile/
    * percentRank/rankLe only read); the aggregate paths keep the
    * uncached parse because mergeIn mutates. */
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

  def fromJson(s: String): Buf = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(s)
    val b = empty()
    if (root == null || !root.isObject) return b
    b.zero = root.path("z").asLong(0L)
    def load(name: String, dst: mutable.HashMap[Int, Long]): Unit = {
      val a = root.path(name)
      if (a.isArray) {
        val it = a.elements()
        while (it.hasNext) {
          val e = it.next()
          if (e.isArray && e.size() == 2)
            dst.update(e.get(0).asInt(), dst.getOrElse(e.get(0).asInt(), 0L) + e.get(1).asLong())
        }
      }
    }
    load("n", b.neg); load("p", b.pos)
    b
  }

  def percentile(b: Buf, p: Double): java.lang.Double = {
    val total = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
    if (total == 0L) return null
    val target = math.max(1L, math.ceil(p / 100.0 * total).toLong)
    var cum = 0L
    // value order: most-negative first = negative buckets by DESC index
    for (i <- b.neg.keysIterator.toArray.sorted.reverseIterator) {
      cum += b.neg(i)
      if (cum >= target) return -estimate(i)
    }
    cum += b.zero
    if (b.zero > 0 && cum >= target) return 0.0
    for (i <- b.pos.keysIterator.toArray.sorted.iterator) {
      cum += b.pos(i)
      if (cum >= target) return estimate(i)
    }
    // unreachable when counts are consistent; guard anyway
    null
  }

  /** percentrank_tdigest: the inverse of [[percentile]] — the value's
    * percentage rank in [0, 100]. Pinned rule: cumulative mass of all
    * buckets strictly before the value's bucket (in value order) plus
    * HALF the value's own bucket, over the total. The half-bucket term
    * makes the pair self-inverse: percentile(b, percentRank(b, v))
    * walks back into v's bucket for any v present in the data, so the
    * round trip is bounded by one bucket's relative error (the
    * contract the gate checks). */
  def percentRank(b: Buf, v: Double): java.lang.Double = {
    val total = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
    if (total == 0L || java.lang.Double.isNaN(v)) return null
    var below = 0L
    var own = 0L
    if (v <= -1e-300) {
      val bi = bucket(-v)
      b.neg.foreach { case (i, c) =>
        if (i > bi) below += c else if (i == bi) own += c
      }
    } else if (v < 1e-300) {
      below += b.neg.valuesIterator.sum
      own = b.zero
    } else {
      val bi = bucket(v)
      below += b.neg.valuesIterator.sum + b.zero
      b.pos.foreach { case (i, c) =>
        if (i < bi) below += c else if (i == bi) own += c
      }
    }
    100.0 * (below + 0.5 * own) / total
  }

  /** `rank_tdigest` read: the number of sketched values ≤ v (the
    * "smaller-or-equal count" rank, pinned — Kusto's doc phrases rank
    * relative to set membership; this engine returns the ≤-count as a
    * long so the value is integral and oracle-comparable). Walks the
    * same sign/zero/bucket cases as [[percentRank]] with own counted
    * fully. Null on the empty sketch or NaN probe. */
  def rankLe(b: Buf, v: Double): java.lang.Long = {
    val total = b.zero + b.pos.valuesIterator.sum + b.neg.valuesIterator.sum
    if (total == 0L || java.lang.Double.isNaN(v)) return null
    var le = 0L
    if (v <= -1e-300) {
      val bi = bucket(-v)
      b.neg.foreach { case (i, c) => if (i >= bi) le += c }
    } else if (v < 1e-300) {
      le = b.neg.valuesIterator.sum + b.zero
    } else {
      val bi = bucket(v)
      le = b.neg.valuesIterator.sum + b.zero
      b.pos.foreach { case (i, c) => if (i <= bi) le += c }
    }
    le
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeLong(b.zero)
    o.writeInt(b.pos.size)
    b.pos.foreach { case (i, c) => o.writeInt(i); o.writeLong(c) }
    o.writeInt(b.neg.size)
    b.neg.foreach { case (i, c) => o.writeInt(i); o.writeLong(c) }
    o.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = empty()
    b.zero = in.readLong()
    var n = in.readInt()
    while (n > 0) { val i = in.readInt(); val c = in.readLong(); b.pos.update(i, c); n -= 1 }
    n = in.readInt()
    while (n > 0) { val i = in.readInt(); val c = in.readLong(); b.neg.update(i, c); n -= 1 }
    b
  }
}

/** `tdigest(x)` — build the pinned log-histogram sketch from raw
  * doubles. Bounded O(buckets) state per group; map-side partials
  * merge by bucket-count addition. */
case class TdigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchOps.Buf] {
  import QuantileSketchOps._
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): Buf = empty()
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b.mergeIn(o); b }
  override def eval(b: Buf): Any = UTF8String.fromString(toJson(b))
  override def serialize(b: Buf): Array[Byte] = QuantileSketchOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): Buf = QuantileSketchOps.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): TdigestAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TdigestAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TdigestAgg =
    copy(child = c.head)
}

/** `tdigest_merge(sketch)` / `merge_tdigest(sketch)` — re-aggregate
  * serialized sketches (the two-level rollup path: per-shard sketches
  * stored, merged at query time — exact bucket-count addition). */
case class TdigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchOps.Buf] {
  import QuantileSketchOps._
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): Buf = empty()
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) b.mergeIn(fromJson(v.toString))
    b
  }
  override def merge(b: Buf, o: Buf): Buf = { b.mergeIn(o); b }
  override def eval(b: Buf): Any = UTF8String.fromString(toJson(b))
  override def serialize(b: Buf): Array[Byte] = QuantileSketchOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): Buf = QuantileSketchOps.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): TdigestMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TdigestMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TdigestMergeAgg =
    copy(child = c.head)
}

/** `percentrank_tdigest(sketch, v)` — see
  * [[QuantileSketchOps.percentRank]] for the pinned rule. Aggregated
  * rows only, so CodegenFallback is free. */
case class PercentRankTdigest(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, v: Any): Any = {
    val b = QuantileSketchOps.fromJsonCached(sketch.toString)
    val vd = v match {
      case d: Double => d
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => other.toString.toDouble
    }
    QuantileSketchOps.percentRank(b, vd)
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"percentrank_tdigest expects a sketch string, got ${left.dataType}")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PercentRankTdigest =
    copy(left = l, right = r)
}

/** `rank_tdigest(sketch, v)` — the ≤-count rank read (see
  * [[QuantileSketchOps.rankLe]]). */
case class RankTdigest(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, v: Any): Any = {
    val b = QuantileSketchOps.fromJsonCached(sketch.toString)
    val vd = v match {
      case d: Double => d
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => other.toString.toDouble
    }
    QuantileSketchOps.rankLe(b, vd)
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rank_tdigest expects a sketch string, got ${left.dataType}")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RankTdigest =
    copy(left = l, right = r)
}

/** `percentile_tdigest(sketch, p)` — nearest-rank walk over the
  * sketch's buckets in value order. Runs on aggregated rows (one per
  * group), so CodegenFallback costs nothing measurable. */
case class PercentileTdigest(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sketch: Any, p: Any): Any = {
    val b = QuantileSketchOps.fromJsonCached(sketch.toString)
    val pd = p match {
      case d: Double => d
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case other => other.toString.toDouble
    }
    QuantileSketchOps.percentile(b, pd)
  }
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"percentile_tdigest expects a sketch string, got ${left.dataType}")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PercentileTdigest =
    copy(left = l, right = r)
}
