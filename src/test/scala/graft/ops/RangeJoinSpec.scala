package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Binned interval-point join: inclusive bounds, intervals spanning
  * multiple buckets, points on bucket edges, and no duplicate matches. */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("containment is exact and inclusive; multi-bucket intervals never duplicate") {
    import spark.implicits._
    // bin = 100: interval A [50, 250] spans buckets 0-2; B [400, 410] one bucket
    val intervals = Seq(("A", 50L, 250L), ("B", 400L, 410L)).toDF("iv", "start_ms", "end_ms")
    val points = Seq(
      ("p1", 49L),  // just before A
      ("p2", 50L),  // inclusive start
      ("p3", 100L), // bucket edge inside A
      ("p4", 250L), // inclusive end
      ("p5", 251L), // just after A
      ("p6", 405L), // inside B
      ("p7", 399L)) // just before B
      .toDF("pt", "ts_ms")
    val got = RangeJoin.intervalPointJoin(intervals, points, "start_ms", "end_ms", "ts_ms", 100L)
      .select("iv", "pt").collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq(("A", "p2"), ("A", "p3"), ("A", "p4"), ("B", "p6")))
    // multi-bucket interval A matched p3 exactly once despite 3 bucket rows
    assert(got.size == got.distinct.size)
  }
}
