package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Backward as-of semantics: latest right row with ts <= left ts per key,
  * exact-timestamp matches included, null when nothing precedes, keys
  * never cross. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("latest-preceding semantics, inclusive ties, null before first, per key") {
    import spark.implicits._
    val quotes = Seq( // key, ts, price
      (1L, ts(10), 100.0), (1L, ts(20), 110.0), (1L, ts(30), 120.0),
      (2L, ts(15), 900.0))
      .toDF("k", "ts", "price")
    val trades = Seq( // key, ts, qty
      (1L, ts(5), 1L),   // before any quote -> null
      (1L, ts(20), 2L),  // exact tie -> 110
      (1L, ts(25), 3L),  // between -> 110
      (1L, ts(99), 4L),  // after last -> 120
      (2L, ts(20), 5L),  // other key -> 900, never 1's quotes
      (3L, ts(50), 6L))  // key with no quotes at all -> null
      .toDF("k", "ts", "qty")

    val out = AsOfJoin.asOfBackward(trades, quotes,
        keys = Seq("k"), leftTs = "ts", rightTs = "ts", rightCols = Seq("price"))
      .orderBy("k", "ts")
      .select("k", "qty", "asof_price")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))

    assert(out.toSeq == Seq(
      (1L, 1L, None), (1L, 2L, Some(110.0)), (1L, 3L, Some(110.0)), (1L, 4L, Some(120.0)),
      (2L, 5L, Some(900.0)), (3L, 6L, None)))
  }

  test("left columns pass through unchanged and in order") {
    import spark.implicits._
    val right = Seq((1L, ts(1), "r")).toDF("k", "ts", "tag")
    val left = Seq((1L, ts(2), "a", 42.0)).toDF("k", "ts", "name", "score")
    val out = AsOfJoin.asOfBackward(left, right, Seq("k"), "ts", "ts", Seq("tag"))
    assert(out.columns.toSeq == Seq("k", "ts", "name", "score", "asof_tag"))
    assert(out.collect().head.getString(4) == "r")
  }
}
