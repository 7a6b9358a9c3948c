package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-step funnel: earliest-completion semantics, strict ordering,
  * stall behavior, and the one-shuffle plan shape. */
class FunnelSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private lazy val events = {
    import spark.implicits._
    Seq(
      // user 1: full conversion, with decoys (click BEFORE signup must
      // not match; the EARLIEST valid continuation wins)
      (1L, 5L, "click"), (1L, 10L, "signup"), (1L, 20L, "click"),
      (1L, 25L, "click"), (1L, 30L, "purchase"),
      // user 2: stalls after signup (its click precedes signup)
      (2L, 50L, "click"), (2L, 60L, "signup"),
      // user 3: signup+click but never purchases
      (3L, 10L, "signup"), (3L, 11L, "click"),
      // user 4: never enters the funnel (no signup) — excluded
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: same-timestamp step must NOT match (strictly after)
      (5L, 10L, "signup"), (5L, 10L, "click"), (5L, 40L, "click"), (5L, 50L, "purchase"))
      .map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
  }

  test("earliest completion, strict ordering, stalls, non-entrants excluded") {
    val out = Funnel.earliest(events, col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "click", "purchase"))
      .orderBy(col("k")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    val byUser = out.map(r => r.getLong(0) ->
      (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
        r.getBoolean(4))).toMap
    // user 1: signup@10, earliest later click@20 (not the pre-signup @5), purchase@30
    assert(byUser(1L) == ((Some(ts(10)), Some(ts(20)), Some(ts(30)), true)))
    // user 2: click@50 precedes signup@60 → stalls at step 2
    assert(byUser(2L) == ((Some(ts(60)), None, None, false)))
    // user 3: no purchase → not converted
    assert(byUser(3L) == ((Some(ts(10)), Some(ts(11)), None, false)))
    // user 5: click at the SAME instant as signup is not "after" → the
    // later click@40 matches, then purchase@50
    assert(byUser(5L) == ((Some(ts(10)), Some(ts(40)), Some(ts(50)), true)))
  }

  test("plan: all step windows share ONE hash exchange (single shuffle on the key)") {
    val out = Funnel.earliest(events, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "click", "purchase"))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, // one for the windows, one for the final agg on the same key
      s"funnel must not shuffle per step; found $exchanges exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "funnel must be window-based, not join-based")
  }

  test("scanEarliest: keyed scan emits matched rows with declare defaults + assignments") {
    val out = Funnel.scanEarliest(events,
        Seq(col("user_id")), Seq(col("ts"), col("event_type")),
        Seq("sid" -> lit(-1L), "amt" -> lit(0.0)),
        Seq(
          Funnel.ScanStep("s1", col("event_type") === "signup",
            Seq("sid" -> col("ts").cast("long"))),
          Funnel.ScanStep("s2", col("event_type") === "purchase")))
      .orderBy(col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      // user 1: signup@10 matches s1 (sid assigned from its own row),
      // earliest later purchase@30 matches s2 carrying sid forward
      (1L, ts(10), "signup", 10L, 0.0),
      (1L, ts(30), "purchase", 10L, 0.0),
      // user 2/3: stall after s1 — only the s1 row is emitted
      (2L, ts(60), "signup", 60L, 0.0),
      (3L, ts(10), "signup", 10L, 0.0),
      // user 4 never matches s1: a purchase BEFORE any signup cannot
      // open an instance → no rows at all
      (5L, ts(10), "signup", 10L, 0.0),
      (5L, ts(50), "purchase", 10L, 0.0)))
  }

  test("scanEarliest: later-step assignment overrides, unassigned default survives") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0))
      .toDF("id", "k", "v")
    val out = Funnel.scanEarliest(df, Nil, Seq(col("id")),
        Seq("x" -> lit(0.0), "tag" -> lit("none")),
        Seq(
          Funnel.ScanStep("s1", col("k") === "a", Seq("x" -> col("v"))),
          Funnel.ScanStep("s2", col("k") === "a", Seq("x" -> (col("v") * 2))),
          Funnel.ScanStep("s3", col("k") === "c")))
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getString(4)))
    // s1 matches id=1 (x=10), s2 the NEXT 'a' id=3 (x=60 overrides), s3 id=4
    // keeps s2's assignment; 'tag' is never assigned → default everywhere
    assert(out.toSeq == Seq((1L, 10.0, "none"), (3L, 60.0, "none"), (4L, 60.0, "none")))
  }

  test("scanEarliest: keyed plan shape — one exchange, no joins") {
    val out = Funnel.scanEarliest(events,
      Seq(col("user_id")), Seq(col("ts")),
      Seq("sid" -> lit(0L)),
      Seq(Funnel.ScanStep("s1", col("event_type") === "signup", Seq("sid" -> lit(1L))),
          Funnel.ScanStep("s2", col("event_type") === "purchase")))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"keyed scan must shuffle once on the key; found $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "scan must be window-based, not join-based")
  }

  test("sequenceDetect: step-window and total-gap bounds prune sequences") {
    import spark.implicits._
    val df = Seq(
      // user 1: a@10, b@20, c@30 — within stepWindow 15 and total gap 25
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2: b arrives 16s after a — beyond the 15s step window
      (2L, 10L, "a"), (2L, 26L, "b"), (2L, 30L, "c"),
      // user 3: each step within window but c lands 26s after a — beyond
      // the 25s total gap
      (3L, 10L, "a"), (3L, 24L, "b"), (3L, 36L, "c"))
      .map { case (u, t, e) => (u, ts(t), e) }
      .toDF("user_id", "ts", "event_type")
      .withColumn("sa", col("event_type") === "a")
      .withColumn("sb", col("event_type") === "b")
      .withColumn("sc", col("event_type") === "c")
    val out = Funnel.sequenceDetect(df, "user_id", col("ts"),
        Seq("sa" -> col("sa"), "sb" -> col("sb"), "sc" -> col("sc")),
        stepWindowUs = 15000000L, totalGapUs = 25000000L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(out.toSeq == Seq((1L, ts(10), ts(20), ts(30))))
  }

  test("scanRunning ≡ sequential state-machine reference on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val n = 20 + rnd.nextInt(30)
      val rows = (0 until n).map(i => (i.toLong, math.floor(rnd.nextDouble() * 100) / 1.0))
      val thresh = rnd.nextInt(100).toDouble
      val df = rows.toDF("id", "v")
      val got = Funnel.scanRunning(df, Nil, Seq(col("id")),
          cond = col("v") >= thresh,
          decls = Seq(
            Funnel.AddAssign("tot", lit(5.0), col("v")),
            Funnel.RowAssign("last", lit(-1.0), col("v")),
            Funnel.NotAssigned("u", lit(9L))))
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      // reference: fold the rows in order through the state machine
      var tot = 5.0
      val want = rows.collect { case (id, v) if v >= thresh =>
        tot += v; (id, tot, v, 9L)
      }
      assert(got.toSeq == want.toSeq, s"thresh=$thresh")
    }
  }

  test("scanEarliest: declared name colliding with an input column is rejected") {
    intercept[IllegalArgumentException] {
      Funnel.scanEarliest(events, Nil, Seq(col("ts")),
        Seq("ts" -> lit(0L)),
        Seq(Funnel.ScanStep("s1", col("event_type") === "signup")))
    }
  }
}
