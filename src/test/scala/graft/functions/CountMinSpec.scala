package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch semantics: never-undercount, bounded overcount,
  * exact merge = single-pass build, canonical serialization. */
class CountMinSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  test("estimate never undercounts; exact on collision-free input") {
    val b = CountMinOps.empty()
    val data = Seq("a" -> 5, "b" -> 3, "c" -> 1)
    data.foreach { case (v, c) => (1 to c).foreach(_ => CountMinOps.add(b, u(v))) }
    data.foreach { case (v, c) => assert(CountMinOps.estimate(b, u(v)) >= c, v) }
    // 3 distinct values in 256 columns × 4 rows: min over rows is exact
    data.foreach { case (v, c) => assert(CountMinOps.estimate(b, u(v)) == c, v) }
    assert(b.n == 9)
  }

  test("merge equals single-pass build (order-insensitive)") {
    val all = CountMinOps.empty()
    val p1 = CountMinOps.empty()
    val p2 = CountMinOps.empty()
    (0 until 500).foreach { i =>
      val v = u(s"k${i % 37}")
      CountMinOps.add(all, v)
      CountMinOps.add(if (i % 2 == 0) p1 else p2, v)
    }
    CountMinOps.mergeIn(p2, p1) // reverse order on purpose
    assert(CountMinOps.toJson(p2) == CountMinOps.toJson(all))
  }

  test("contract holds on a skewed stream: true <= est <= true + eps*N") {
    val b = CountMinOps.empty()
    // Zipf-ish: value i appears ceil(1000/i) times, 200 distinct values
    val counts = (1 to 200).map(i => s"v$i" -> math.ceil(1000.0 / i).toLong)
    counts.foreach { case (v, c) => (1L to c).foreach(_ => CountMinOps.add(b, u(v))) }
    val n = b.n
    counts.foreach { case (v, c) =>
      val e = CountMinOps.estimate(b, u(v))
      assert(e >= c, s"undercount on $v")
      assert(e <= c + 1 + n / 50, s"overcount beyond 2%N on $v: $e vs $c (n=$n)")
    }
  }

  test("json round trip is canonical and total-preserving") {
    val b = CountMinOps.empty()
    (0 until 100).foreach(i => CountMinOps.add(b, u(s"x${i % 11}")))
    val j = CountMinOps.toJson(b)
    assert(j.startsWith("""{"d":4,"w":256,"n":100,"r":[["""))
    val b2 = CountMinOps.fromJson(j)
    assert(CountMinOps.toJson(b2) == j)
    assert(java.util.Arrays.equals(
      CountMinOps.serialize(CountMinOps.deserialize(CountMinOps.serialize(b))),
      CountMinOps.serialize(b)))
  }
}
