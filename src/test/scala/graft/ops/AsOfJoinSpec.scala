package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** As-of semantics: backward (latest right ts <= left ts), forward
  * (earliest right ts >= left ts), nearest (smaller gap wins, backward
  * on ties), each per key with exact-timestamp matches included, null
  * when nothing qualifies, keys never crossing, and an optional
  * tolerance bound on the gap. */
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

  private def quotesTrades = {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts(10), 100.0), (1L, ts(20), 110.0), (1L, ts(30), 120.0),
      (2L, ts(15), 900.0))
      .toDF("k", "ts", "price")
    val trades = Seq(
      (1L, ts(5), 1L), (1L, ts(20), 2L), (1L, ts(26), 3L), (1L, ts(99), 4L),
      (2L, ts(20), 5L), (3L, ts(50), 6L))
      .toDF("k", "ts", "qty")
    (quotes, trades)
  }
  private def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Option[Double])] =
    df.orderBy("k", "ts").select("k", "qty", "asof_price").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq

  test("forward: earliest right at-or-after, inclusive ties, null after last") {
    val (quotes, trades) = quotesTrades
    val out = run(AsOfJoin.asOfForward(trades, quotes, Seq("k"), "ts", "ts", Seq("price")))
    assert(out == Seq(
      (1L, 1L, Some(100.0)), // ts 5 -> first quote at 10
      (1L, 2L, Some(110.0)), // exact tie at 20
      (1L, 3L, Some(120.0)), // ts 26 -> quote at 30
      (1L, 4L, None),        // ts 99 -> nothing after
      (2L, 5L, None),        // ts 20 -> key 2's only quote is at 15
      (3L, 6L, None)))
  }

  test("nearest: smaller gap wins, backward on exact gap ties") {
    val (quotes, trades) = quotesTrades
    val out = run(AsOfJoin.asOfNearest(trades, quotes, Seq("k"), "ts", "ts", Seq("price")))
    assert(out == Seq(
      (1L, 1L, Some(100.0)), // only forward exists
      (1L, 2L, Some(110.0)), // exact match
      (1L, 3L, Some(120.0)), // gap 6 back vs 4 fwd -> forward
      (1L, 4L, Some(120.0)), // only backward exists
      (2L, 5L, Some(900.0)),
      (3L, 6L, None)))
    // exact gap tie: trade at 25 is 5 from both 20 and 30 -> backward wins
    import spark.implicits._
    val tie = Seq((1L, ts(25), 9L)).toDF("k", "ts", "qty")
    assert(run(AsOfJoin.asOfNearest(tie, quotes, Seq("k"), "ts", "ts", Seq("price"))) ==
      Seq((1L, 9L, Some(110.0))))
  }

  test("tolerance bounds the gap in every direction (interval for timestamps)") {
    val (quotes, trades) = quotesTrades
    val tol = Some(org.apache.spark.sql.functions.expr("INTERVAL 6 SECONDS"))
    val back = run(AsOfJoin.asOfBackward(trades, quotes, Seq("k"), "ts", "ts", Seq("price"),
      tolerance = tol))
    assert(back == Seq(
      (1L, 1L, None), (1L, 2L, Some(110.0)), (1L, 3L, Some(110.0)),
      (1L, 4L, None), // gap 69 > 6s: match degrades to null
      (2L, 5L, Some(900.0)), (3L, 6L, None)))
    val fwd = run(AsOfJoin.asOfForward(trades, quotes, Seq("k"), "ts", "ts", Seq("price"),
      tolerance = tol))
    assert(fwd == Seq(
      (1L, 1L, Some(100.0)), (1L, 2L, Some(110.0)), (1L, 3L, Some(120.0)),
      (1L, 4L, None), (2L, 5L, None), (3L, 6L, None)))
    val near = run(AsOfJoin.asOfNearest(trades, quotes, Seq("k"), "ts", "ts", Seq("price"),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 4 SECONDS"))))
    assert(near == Seq(
      (1L, 1L, None),        // gap 5 fwd > 4s
      (1L, 2L, Some(110.0)), // exact
      (1L, 3L, Some(120.0)), // back gap 6 fails, fwd gap 4 passes
      (1L, 4L, None), (2L, 5L, None), (3L, 6L, None)))
  }

  test("nearest plans one exchange: the second window sort reuses the shuffle") {
    val (quotes, trades) = quotesTrades
    val plan = AsOfJoin.asOfNearest(trades, quotes, Seq("k"), "ts", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
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
