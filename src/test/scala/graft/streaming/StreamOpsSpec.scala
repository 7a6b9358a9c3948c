package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Event-time streaming operators: window semantics checked on batch
  * frames (same Catalyst operators), watermark/state behavior checked on
  * MemoryStream queries (late-data drop, dedup eviction, session close
  * via event-time timeout). */
class StreamOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streamops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // offset from epoch 0: the initial watermark is 0 and rows at ts <= wm
  // are dropped, so t=0 events would silently vanish in streaming tests
  private val Base = 100000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000L)
  private def rel(t: Timestamp): Long = t.getTime / 1000 - Base
  import StreamOps.SEvent

  test("tumbling windows on batch: events land in 10s buckets per key") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1), "a"), (1L, ts(9), "a"), (1L, ts(11), "a"),
      (2L, ts(3), "b"), (2L, ts(25), "b"))
      .toDF("user_id", "ts", "event_type")
    val out = StreamOps.tumblingCounts(df, "ts", "5 seconds", "10 seconds", "user_id")
      .orderBy("user_id", "window_start")
      .collect()
      .map(r => (r.getLong(2), rel(r.getTimestamp(0)), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 2L), (1L, 10L, 1L), (2L, 0L, 1L), (2L, 20L, 1L)))
  }

  test("sliding windows on batch: 10s window sliding by 5s double-counts overlaps") {
    import spark.implicits._
    val df = Seq((1L, ts(7), 100L)).toDF("user_id", "ts", "amount")
    val out = StreamOps.slidingAgg(df, "ts", "5 seconds", "10 seconds", "5 seconds", "amount", "user_id")
      .orderBy("window_start").collect()
      .map(r => (rel(r.getTimestamp(0)), r.getLong(3), r.getLong(4)))
    // event at t=7 falls in windows [0,10) and [5,15)
    assert(out.toSeq == Seq((0L, 1L, 100L), (5L, 1L, 100L)))
  }

  test("session_window on batch: 5s gap merges, 6s gap splits") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0), "x"), (1L, ts(4), "x"), (1L, ts(8), "x"), // one session 0..13
      (1L, ts(20), "x")) // gap 12s > 5s: new session
      .toDF("user_id", "ts", "event_type")
    val out = StreamOps.sessionWindowAgg(df, "ts", "5 seconds", "5 seconds", "user_id")
      .orderBy("session_start").collect()
      .map(r => (rel(r.getTimestamp(0)), rel(r.getTimestamp(1)), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 13L, 3L), (20L, 25L, 1L)))
  }

  test("streaming tumbling window with watermark drops too-late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = StreamOps.tumblingCounts(stream.toDF(), "ts", "5 seconds", "10 seconds", "user_id")
      .writeStream.format("memory").queryName("tumble_wm").outputMode(OutputMode.Append).start()
    try {
      stream.addData(SEvent(1, ts(1), "a"), SEvent(1, ts(8), "a"))
      q.processAllAvailable()
      // advance watermark to 95-5=90: window [0,10) closes and emits
      stream.addData(SEvent(1, ts(95), "a"))
      q.processAllAvailable()
      // t=2 is far behind the watermark: silently dropped
      stream.addData(SEvent(1, ts(2), "late"))
      q.processAllAvailable()
      stream.addData(SEvent(1, ts(200), "a"))
      q.processAllAvailable()
      val rows = spark.table("tumble_wm").collect()
        .map(r => (rel(r.getTimestamp(0)), r.getLong(3))).toSet
      assert(rows.contains((0L, 2L)), s"window [0,10) should hold exactly the 2 on-time events, got $rows")
      assert(!rows.contains((0L, 3L)), "late event must not reopen a closed window")
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicate keys within the horizon are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = StreamOps.dedupWithinWatermark(stream.toDF(), "ts", "10 seconds", "user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_wm").outputMode(OutputMode.Append).start()
    try {
      stream.addData(SEvent(1, ts(1), "click"), SEvent(1, ts(2), "click"), SEvent(2, ts(1), "click"))
      q.processAllAvailable()
      stream.addData(SEvent(1, ts(3), "click")) // still within horizon: dropped
      q.processAllAvailable()
      val n = spark.table("dedup_wm").count()
      assert(n == 2, s"expected first-wins per (user, type), got $n rows")
    } finally q.stop()
  }

  test("dedupBySignature: near-identical documents dedup on simhash within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.queries.LlmQueries.registerFunctions(spark)
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("doc_id", "ts", "text")
    val q = StreamOps.dedupBySignature(df, "ts", "10 seconds",
        org.apache.spark.sql.functions.expr("simhash32(text)"))
      .writeStream.format("memory").queryName("dedup_sig").outputMode(OutputMode.Append).start()
    try {
      stream.addData(
        (1L, ts(1), "the quick brown fox jumps over the lazy dog"),
        (2L, ts(2), "the quick brown fox jumps over the lazy dog"), // exact copy: same signature
        (3L, ts(3), "a completely different document about spark streaming"))
      q.processAllAvailable()
      val kept = spark.table("dedup_sig").select("doc_id").as[Long].collect().sorted
      assert(kept.length == 2 && kept.contains(3L), s"got ${kept.mkString(",")}")
      assert(!spark.table("dedup_sig").columns.contains("__sig"), "signature column is internal")
    } finally q.stop()
  }

  test("streamingIncrementalDedup: verdicts match the batch q202 classification on one fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.queries.LlmQueries.registerFunctions(spark)
    // q202's id convention: corpus (old) ids % 3 != 0, arrivals (new) % 3 == 0
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "apache spark structured streaming handles stateful aggregation"),
      (4L, "wide tables compress better with dictionary encoding enabled"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      (3L, ts(1), "the quick brown fox jumps over the lazy dog"), // exact copy of 1
      (6L, ts(2), "apache spark structured streaming handles stateful aggregation nicely"), // superset of 2
      (9L, ts(3), "a totally fresh document about something else entirely unrelated"),
      (12L, ts(4), "hi there")) // < 3 words: no signature, kept
    val stream = MemoryStream[(Long, Timestamp, String)]
    val df = stream.toDF().toDF("doc_id", "ts", "text")
    val q = StreamOps.streamingIncrementalDedup(df, "doc_id", "text", corpus, bandCap = 200)
      .writeStream.format("memory").queryName("inc_dedup").outputMode(OutputMode.Append).start()
    val got = try {
      stream.addData(
        (3L, ts(1), "the quick brown fox jumps over the lazy dog"),
        (6L, ts(2), "apache spark structured streaming handles stateful aggregation nicely"),
        (9L, ts(3), "a totally fresh document about something else entirely unrelated"),
        (12L, ts(4), "hi there"))
      q.processAllAvailable()
      spark.table("inc_dedup").select("doc_id", "verdict").as[(Long, String)].collect().toMap
    } finally q.stop()
    // batch classification of the SAME union fixture, the q202 CTE chain
    corpus.select("doc_id", "text")
      .union(arrivals.toDF("doc_id", "ts", "text").select("doc_id", "text"))
      .createOrReplaceTempView("incdocs")
    val batch = spark.sql(
      """WITH sig AS (
        |  SELECT doc_id, minhash_sig(text) AS mh FROM incdocs
        |  WHERE size(split(lower(text), '\\s+')) >= 3),
        |bands AS (
        |  SELECT doc_id, b,
        |         md5(concat_ws(',', cast(element_at(mh, b*3+1) AS string),
        |             cast(element_at(mh, b*3+2) AS string),
        |             cast(element_at(mh, b*3+3) AS string))) AS bh
        |  FROM sig LATERAL VIEW explode(sequence(0, 3)) bt AS b),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM bands n JOIN bands o ON n.b = o.b AND n.bh = o.bh
        |  WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 != 0),
        |near0 AS (
        |  SELECT DISTINCT new_id FROM (
        |    SELECT cand.new_id,
        |           size(filter(sequence(0, 11), k -> element_at(sa.mh, k+1) = element_at(sb.mh, k+1)))
        |             / cast(12 AS double) AS ej
        |    FROM cand JOIN sig sa ON cand.new_id = sa.doc_id
        |              JOIN sig sb ON cand.old_id = sb.doc_id)
        |  WHERE ej >= 0.5),
        |hashes AS (SELECT doc_id, md5(lower(text)) AS h FROM incdocs),
        |exact0 AS (
        |  SELECT DISTINCT n.doc_id AS new_id
        |  FROM hashes n JOIN (SELECT DISTINCT h FROM hashes WHERE doc_id % 3 != 0) o ON n.h = o.h
        |  WHERE n.doc_id % 3 = 0)
        |SELECT d.doc_id,
        |       CASE WHEN e.new_id IS NOT NULL THEN 'exact'
        |            WHEN nr.new_id IS NOT NULL THEN 'near'
        |            ELSE 'kept' END AS verdict
        |FROM (SELECT doc_id FROM incdocs WHERE doc_id % 3 = 0) d
        |LEFT JOIN exact0 e ON e.new_id = d.doc_id
        |LEFT JOIN near0 nr ON nr.new_id = d.doc_id""".stripMargin)
      .as[(Long, String)].collect().toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got(3L) == "exact" && got(9L) == "kept" && got(12L) == "kept",
      s"fixture verdicts moved: $got")
    assert(got(6L) == "near", s"superset doc must classify near: $got")
  }

  test("lshCandidatePairs: first doc per bucket keeps, later arrivals emit pairs, disjoint buckets stay silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Seq[String])]
    val df = stream.toDF().toDF("doc_id", "ts", "bands")
    val q = StreamOps.lshCandidatePairs(df, "ts", "10 seconds", "doc_id",
        org.apache.spark.sql.functions.col("bands"), horizonMs = 60000L)
      .writeStream.format("memory").queryName("lsh_cand").outputMode(OutputMode.Append).start()
    try {
      stream.addData(
        (1L, ts(1), Seq("b0", "b1")),  // keeper of b0, b1
        (2L, ts(2), Seq("b1", "b2")),  // pair with 1 via b1; keeper of b2
        (3L, ts(3), Seq("b9")),        // lone bucket: silent
        (4L, ts(4), Seq("b0", "b2")))  // pairs with 1 (b0) and 2 (b2)
      q.processAllAvailable()
      val pairs = spark.table("lsh_cand")
        .select("bucket", "keeper", "candidate")
        .as[(String, Long, Long)].collect().sorted
      assert(pairs.toSeq == Seq(("b0", 1L, 4L), ("b1", 1L, 2L), ("b2", 2L, 4L)),
        s"got ${pairs.mkString(",")}")
    } finally q.stop()
  }

  test("enrichJoin: stream-stream banded join matches in-window dims only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[SEvent]
    val dims = MemoryStream[(Long, Timestamp, String)]
    val enriched = StreamOps.enrichJoin(
      facts.toDF(), dims.toDF().toDF("user_id", "ts_d", "tier"),
      key = "user_id", factsTs = "ts", dimsTs = "ts_d",
      delayThreshold = "5 seconds", lookback = "10 seconds")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    // dim at t=5 is inside [t-10, t] for the fact at t=12; the dim at
    // t=30 is in the future of the fact and must NOT match; user 2's
    // dim is 20s before the fact — outside the band
    dims.addData((1L, ts(5), "gold"), (1L, ts(30), "late-gold"), (2L, ts(0), "iron"))
    facts.addData(SEvent(1L, ts(12), "purchase"), SEvent(2L, ts(20), "purchase"))
    q.processAllAvailable()
    // advance both watermarks so matched pairs are emitted
    dims.addData((9L, ts(90), "x"))
    facts.addData(SEvent(9L, ts(90), "x"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enriched")
      .filter($"event_type" === "purchase")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("tier")))
    assert(rows.toSeq == Seq((1L, "gold")), s"got ${rows.toSeq}")
  }

  test("statefulSessions: sessions close on event-time timeout, one row per closed session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val sessions = StreamOps.statefulSessions(stream.toDS(), "2 seconds", gapMs = 5000L)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0s,3s (one session); user 2: event at 1s
      stream.addData(SEvent(1, ts(0), "a"), SEvent(1, ts(3), "a"), SEvent(2, ts(1), "b"))
      q.processAllAvailable()
      // advance watermark far past both sessions' end+gap
      stream.addData(SEvent(3, ts(100), "c"))
      q.processAllAvailable()
      stream.addData(SEvent(3, ts(200), "c")) // extra batch so timeouts fire
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), rel(r.getTimestamp(1)), rel(r.getTimestamp(2)), r.getLong(3)))
        .toSet
      assert(rows.contains((1L, 0L, 3L, 2L)), s"user 1 session 0..3 with 2 events, got $rows")
      assert(rows.contains((2L, 1L, 1L, 1L)), s"user 2 singleton session, got $rows")
    } finally q.stop()
  }

  test("statefulSessions: a mid-batch gap closes the first session immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val sessions = StreamOps.statefulSessions(stream.toDS(), "2 seconds", gapMs = 5000L)
    val q = sessions.writeStream.format("memory").queryName("sess_split")
      .outputMode(OutputMode.Append).start()
    try {
      // both events in ONE batch, 20s apart: first session closes in-batch
      stream.addData(SEvent(7, ts(0), "a"), SEvent(7, ts(20), "a"))
      q.processAllAvailable()
      val rows = spark.table("sess_split").collect()
        .map(r => (r.getLong(0), rel(r.getTimestamp(1)), r.getLong(3))).toSet
      assert(rows.contains((7L, 0L, 1L)), s"first session should emit without waiting for a watermark, got $rows")
    } finally q.stop()
  }

  test("streamingScanStateful: batch/stream agreement on the two-step q253 machine") {
    // the round-15 sequence-agreement playbook on the GENERAL runner
    // (round 19; round 18's runner hard-coded this machine): ONE machine
    // description —  s1: true => v0 = value;
    //                s2: value > s1.v0 => gap = value - s2.v0
    // keyed by user, ordered by ts — runs through (a) the batch
    // graft.ops.Funnel.scanStateful and (b) streamingScanStateful on
    // MemoryStream split across two micro-batches (state carries);
    // every (user, ts, v0, gap, match id) must agree.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DoubleType
    val fixture = Seq(
      // user 1: start 5.0, extend DOWN to 3.0 (same id), promote on 4.0,
      // then new sequence 9.0 (id 2), promote 9.5
      VEvent(1L, ts(1), 5.0), VEvent(1L, ts(2), 3.0), VEvent(1L, ts(3), 4.0),
      VEvent(1L, ts(4), 9.0), VEvent(1L, ts(5), 9.5),
      // user 2: monotone descending — every row extends ONE open
      // sequence, nothing completes
      VEvent(2L, ts(1), 7.0), VEvent(2L, ts(2), 6.0), VEvent(2L, ts(3), 5.0),
      // user 3: immediate promote on the second row
      VEvent(3L, ts(1), 1.0), VEvent(3L, ts(2), 2.0))
    // ONE machine description feeds both sides
    val declares = Seq(
      ("v0", DoubleType, lit(null).cast(DoubleType)),
      ("gap", DoubleType, lit(null).cast(DoubleType)))
    val steps = Seq(
      graft.ops.Funnel.StatefulStep("s1", lit(true),
        assigns = Seq("v0" -> col("value"))),
      graft.ops.Funnel.StatefulStep("s2",
        col("value") > col("__scan_state_0__v0"),
        assigns = Seq("gap" -> (col("value") - col("__scan_state_1__v0")))))
    val stateRefs = Seq(
      graft.ops.Funnel.StateRef(0, "v0", DoubleType, isDeclared = true),
      graft.ops.Funnel.StateRef(1, "v0", DoubleType, isDeclared = true))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       r.getAs[java.lang.Double]("v0"),
       Option(r.getAs[java.lang.Double]("gap")).map(_.doubleValue),
       r.getAs[Long]("m"))
    val batch = graft.ops.Funnel.scanStateful(
      fixture.toDF(), partitionCols = Seq(col("user_id")), orderCols = Seq(col("ts")),
      declares, steps, stateRefs, matchIdCol = Some("m")).collect().map(key).toSet

    val stream = MemoryStream[VEvent]
    val q = StreamOps.streamingScanStateful(stream.toDS().toDF(),
        keyCols = Seq("user_id"), tsCol = "ts", delayThreshold = "5 seconds",
        horizonMs = 3600000L, declares, steps, stateRefs, matchIdCol = Some("m"))
      .writeStream.format("memory").queryName("scan_pairs")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(2).getTime)
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("scan_pairs").collect().map(key).toSet
      assert(streamed == batch,
        s"batch/stream verdicts diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("streamingScanStateful: 3-step output=last machine agrees with batch across batches") {
    // the multi-step generalization gate (round 19): an ascending-run
    // detector —  s1: true          => v0 = value   (emit=false)
    //             s2: value > s1.v0 => v1 = value   (emit=false)
    //             s3: value > s2.v1 => tot = value - s3.v0
    // only the completing row emits (output=last); s3's ASSIGNMENT reads
    // the sequence's own carried v0 (post-move state at step 2), the
    // cross-step delta rule the batch machine pins. The three-batch
    // split places s1/s2 and the completing s3 in different micro-batches
    // so the full multi-step state (two open steps, captured rows,
    // declared values) must round-trip the state store.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DoubleType
    val fixture = Seq(
      // user 1: 1,2,3 completes (tot=2, id 1); then 5 starts id 2, 4
      // extends DOWN (id 2), 6 promotes, 7 completes (tot = 7-4 = 3)
      VEvent(1L, ts(1), 1.0), VEvent(1L, ts(2), 2.0), VEvent(1L, ts(3), 3.0),
      VEvent(1L, ts(4), 5.0), VEvent(1L, ts(5), 4.0), VEvent(1L, ts(6), 6.0),
      VEvent(1L, ts(7), 7.0),
      // user 2: 9,8,7 — every row re-opens/extends s1, never completes
      VEvent(2L, ts(1), 9.0), VEvent(2L, ts(2), 8.0), VEvent(2L, ts(3), 7.0))
    val declares = Seq(
      ("v0", DoubleType, lit(null).cast(DoubleType)),
      ("v1", DoubleType, lit(null).cast(DoubleType)),
      ("tot", DoubleType, lit(null).cast(DoubleType)))
    val steps = Seq(
      graft.ops.Funnel.StatefulStep("s1", lit(true),
        assigns = Seq("v0" -> col("value")), emit = false),
      graft.ops.Funnel.StatefulStep("s2",
        col("value") > col("__scan_state_0__v0"),
        assigns = Seq("v1" -> col("value")), emit = false),
      graft.ops.Funnel.StatefulStep("s3",
        col("value") > col("__scan_state_1__v1"),
        assigns = Seq("tot" -> (col("value") - col("__scan_state_2__v0")))))
    val stateRefs = Seq(
      graft.ops.Funnel.StateRef(0, "v0", DoubleType, isDeclared = true),
      graft.ops.Funnel.StateRef(1, "v1", DoubleType, isDeclared = true),
      graft.ops.Funnel.StateRef(2, "v0", DoubleType, isDeclared = true))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       r.getAs[java.lang.Double]("v0"), r.getAs[java.lang.Double]("v1"),
       r.getAs[java.lang.Double]("tot"), r.getAs[Long]("m"))
    val batch = graft.ops.Funnel.scanStateful(
      fixture.toDF(), partitionCols = Seq(col("user_id")), orderCols = Seq(col("ts")),
      declares, steps, stateRefs, matchIdCol = Some("m")).collect().map(key).toSet
    assert(batch.nonEmpty && batch.forall(_._5 != null),
      s"output=last: only completing rows with a tot, got $batch")

    val stream = MemoryStream[VEvent]
    val q = StreamOps.streamingScanStateful(stream.toDS().toDF(),
        keyCols = Seq("user_id"), tsCol = "ts", delayThreshold = "5 seconds",
        horizonMs = 3600000L, declares, steps, stateRefs, matchIdCol = Some("m"))
      .writeStream.format("memory").queryName("scan_last")
      .outputMode(OutputMode.Append).start()
    try {
      // three micro-batches: ts 1-2 | 3-5 | 6-7
      val b1 = fixture.filter(_.ts.getTime <= ts(2).getTime)
      val b2 = fixture.filter(e => e.ts.getTime > ts(2).getTime && e.ts.getTime <= ts(5).getTime)
      val b3 = fixture.filter(_.ts.getTime > ts(5).getTime)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
      val streamed = spark.table("scan_last").collect().map(key).toSet
      assert(streamed == batch,
        s"batch/stream verdicts diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("streamingScanStateful: randomized machines match the batch kernel across random splits") {
    // property form of the two fixture gates: randomly assembled 2/3-step
    // machines (predicates/assignments drawn from pools that read live
    // declared state AND captured input columns), random per-step emit
    // flags, random events, random 1-3 micro-batch splits — the batch
    // kernel (itself property-proven against an independent simulator in
    // ScanStatefulPropertySpec) is the oracle. Captures crossing a split
    // exercise the scala-form state-store round-trip.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DoubleType
    import graft.ops.Funnel.{StatefulStep, StateRef}
    val rnd = new scala.util.Random(0x19ab5eedL)
    def pickFrom[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    def refsFor(nSteps: Int) = Seq(
      StateRef(0, "t", DoubleType, isDeclared = true),
      StateRef(1, "t", DoubleType, isDeclared = true),
      StateRef(0, "value", DoubleType, isDeclared = false),
      StateRef(1, "value", DoubleType, isDeclared = false)) ++
      (if (nSteps > 2) Seq(StateRef(2, "t", DoubleType, isDeclared = true)) else Nil)
    val declares = Seq(
      ("t", DoubleType, lit(0.0).cast(DoubleType)),
      ("g", DoubleType, lit(null).cast(DoubleType)))
    def p1() = pickFrom(Seq(lit(true), col("value") > 2.0, col("value") <= 8.0))
    def p2() = pickFrom(Seq(
      col("value") > col("__scan_state_0__t"),
      col("value") > col("__scan_state_0__value"), // capture read
      col("value") <= col("__scan_state_0__value") + lit(5.0),
      lit(true)))
    def p3() = pickFrom(Seq(
      col("value") > col("__scan_state_1__t"),
      col("value") =!= col("__scan_state_1__value")))
    def a1() = pickFrom(Seq[Seq[(String, org.apache.spark.sql.Column)]](
      Seq("t" -> col("value")),
      Seq("t" -> (col("__scan_state_0__t") + col("value"))), // running sum, seeds from default
      Nil))
    def aLast(last: Int) = pickFrom(Seq[Seq[(String, org.apache.spark.sql.Column)]](
      Seq("g" -> (col("value") - col(s"__scan_state_${last}__t"))),
      Seq("g" -> (col("value") - col("__scan_state_0__value"))), // cleared on promote ⇒ null
      Nil))
    for (it <- 0 until 6) {
      val nSteps = 2 + rnd.nextInt(2)
      val refs = refsFor(nSteps)
      val steps =
        if (nSteps == 2) Seq(
          StatefulStep("s1", p1(), a1(), emit = rnd.nextBoolean()),
          StatefulStep("s2", p2(), aLast(1), emit = true))
        else Seq(
          StatefulStep("s1", p1(), a1(), emit = rnd.nextBoolean()),
          StatefulStep("s2", p2(), Seq("t" -> col("value")), emit = rnd.nextBoolean()),
          StatefulStep("s3", p3(), aLast(2), emit = true))
      val fixture = for {
        u <- 1L to 3L
        sec <- 1 to (8 + rnd.nextInt(7))
        if rnd.nextDouble() < 0.7
      } yield VEvent(u, ts(sec), math.rint(rnd.nextDouble() * 100.0) / 10.0)
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")), r.getAs[Double]("value"),
         Option(r.getAs[java.lang.Double]("t")), Option(r.getAs[java.lang.Double]("g")),
         r.getAs[Long]("m"))
      val batch = graft.ops.Funnel.scanStateful(
        fixture.toDF(), Seq(col("user_id")), Seq(col("ts")),
        declares, steps, refs, matchIdCol = Some("m")).collect().map(key).toSet
      val stream = MemoryStream[VEvent]
      val q = StreamOps.streamingScanStateful(stream.toDS().toDF(),
          Seq("user_id"), "ts", "5 seconds", 3600000L,
          declares, steps, refs, matchIdCol = Some("m"))
        .writeStream.format("memory").queryName(s"scan_prop_$it")
        .outputMode(OutputMode.Append).start()
      try {
        val cuts = Seq.fill(rnd.nextInt(2) + 1)(1 + rnd.nextInt(14)).distinct.sorted
        val batches = (Seq(Long.MinValue) ++ cuts.map(c => ts(c).getTime) ++ Seq(Long.MaxValue))
          .sliding(2).map { case Seq(lo, hi) =>
            fixture.filter(e => e.ts.getTime > lo && e.ts.getTime <= hi) }.toSeq
        batches.foreach { b =>
          if (b.nonEmpty) { stream.addData(b: _*); q.processAllAvailable() }
        }
        q.processAllAvailable()
        val streamed = spark.table(s"scan_prop_$it").collect().map(key).toSet
        assert(streamed == batch,
          s"iteration $it diverged (steps=${steps.map(_.cond)}, cuts=$cuts):\n" +
          s"  batch=$batch\n  stream=$streamed")
      } finally q.stop()
    }
  }

  test("KQL scan over a streaming source compiles to the streaming runner (batch parity)") {
    // one KQL text, two sources (round 19): on a batch frame the scan
    // takes the batch stateful machine; on a MemoryStream frame the SAME
    // text lowers to streamingScanStateful (keyed by the partition
    // column, event time from the ascending order-by, lateness bound
    // from the engine-extension `set streaming_watermark`). The two
    // executions must agree row-for-row on in-watermark data.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    val kql =
      """set streaming_watermark = 5s;
        #set streaming_horizon = 1h;
        #t
        #| order by ts asc
        #| partition by user_id ( scan with_match_id=m declare (v0: real = 0.0, gap: real = -1.0) with (
        #    step s1: true => v0 = value;
        #    step s2: value > s1.v0 => gap = value - s2.v0;
        #  ) )
        #| project user_id, ts, value, v0, gap, m""".stripMargin('#')
    val fixture = Seq(
      VEvent(1L, ts(1), 5.0), VEvent(1L, ts(2), 3.0), VEvent(1L, ts(3), 4.0),
      VEvent(1L, ts(4), 9.0), VEvent(1L, ts(5), 9.5),
      VEvent(2L, ts(1), 7.0), VEvent(2L, ts(2), 6.0), VEvent(2L, ts(3), 5.0),
      VEvent(3L, ts(1), 1.0), VEvent(3L, ts(2), 2.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       r.getAs[java.lang.Double]("v0"),
       Option(r.getAs[java.lang.Double]("gap")).map(_.doubleValue),
       r.getAs[Long]("m"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet

    val stream = MemoryStream[VEvent]
    val streamDf = graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF())
    assert(streamDf.isStreaming, "the compiled frame must stay a streaming frame")
    val q = streamDf.writeStream.format("memory").queryName("kql_scan_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(2).getTime)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("kql_scan_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"KQL batch/stream scan diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()

    // loud contracts: a streaming scan without the watermark set must
    // fail AT COMPILE with a clear message; an UNKEYED streaming scan
    // compiles (round 20 — machine state is bounded, so the q117-class
    // running accumulator is streamable) but warns about the single
    // state partition; a single order-by column warns about tie order
    val noWm = intercept[Exception](graft.kql.KqlCompiler.compile(
      kql.linesIterator.filterNot(_.startsWith("set streaming_watermark"))
        .mkString("\n"), _ => stream.toDS().toDF()))
    assert(noWm.getMessage.contains("streaming_watermark"), noWm.getMessage)
    val (unkeyedDf, ws) = graft.kql.KqlCompiler.compileWithWarnings(
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc
        #| scan declare (a: real = 0.0) with (step s1: true => a = a + value;)""".stripMargin('#'),
      _ => stream.toDS().toDF())
    assert(unkeyedDf.isStreaming)
    assert(ws.exists(_.contains("ONE state partition")), ws.mkString("; "))
    assert(ws.exists(_.contains("ARRIVAL order")), ws.mkString("; "))
  }

  test("KQL row_window_session over a streaming source lowers to the streaming counterpart") {
    // same one-text-two-sources gate as the streaming scan: the keyed
    // sessionization extend must agree between the batch kernel and the
    // flatMapGroupsWithState lowering, with the session spanning the
    // micro-batch split (idle=5s, maxFromFirst=8s — t9 re-anchors)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc
        #| partition by user_id ( extend sess = row_window_session(ts, 8s, 5s) )
        #| project user_id, ts, sess""".stripMargin('#')
    val fixture = Seq(
      SEvent(1L, ts(0), "a"), SEvent(1L, ts(3), "a"), SEvent(1L, ts(6), "a"),
      SEvent(1L, ts(9), "a"), SEvent(1L, ts(12), "a"),
      SEvent(2L, ts(0), "b"), SEvent(2L, ts(10), "b"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       rel(r.getAs[Timestamp]("sess")))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    assert(batch.contains((1L, 9L, 9L)), s"moving anchor must re-open at t9: $batch")

    val stream = MemoryStream[SEvent]
    val streamDf = graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF())
    assert(streamDf.isStreaming)
    val q = streamDf.writeStream.format("memory").queryName("kql_rws_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(6).getTime)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("kql_rws_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"KQL batch/stream sessions diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("streamingRowWindowSession: batch/stream parity, session spanning two micro-batches") {
    // the q179-class sessionization scalar (round-19 item 7): max
    // duration from the CURRENT session's start (moving anchor) + idle
    // gap, batch kernel vs the flatMapGroupsWithState counterpart on
    // the same fixture. idle=5s, maxFromFirst=8s:
    //   user 1 @ 0,3,6 | 9,12  — t9 re-anchors on the max-duration rule,
    //     with sessStart=0/prevTs=6 carried ACROSS the micro-batch split
    //   user 2 @ 0 | 10        — idle gap re-anchor across the split
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val fixture = Seq(
      SEvent(1L, ts(0), "a"), SEvent(1L, ts(3), "a"), SEvent(1L, ts(6), "a"),
      SEvent(1L, ts(9), "a"), SEvent(1L, ts(12), "a"),
      SEvent(2L, ts(0), "b"), SEvent(2L, ts(10), "b"))
    val maxFirstUs = 8000000L
    val idleUs = 5000000L
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       rel(r.getAs[Timestamp]("sess")))
    val batch = graft.ops.Funnel.rowWindowSession(
      fixture.toDF(), partitionCols = Seq(col("user_id")), orderCols = Seq(col("ts")),
      ts = col("ts"), maxFirstUs = maxFirstUs, idleUs = idleUs,
      restart = None, outName = "sess").collect().map(key).toSet
    // sanity: the moving anchor re-opened at t=9 for user 1
    assert(batch.contains((1L, 9L, 9L)) && batch.contains((1L, 6L, 0L)), s"batch=$batch")

    val stream = MemoryStream[SEvent]
    val q = StreamOps.streamingRowWindowSession(stream.toDS().toDF(),
        keyCols = Seq("user_id"), tsCol = "ts", delayThreshold = "5 seconds",
        horizonMs = 3600000L, maxFirstUs = maxFirstUs, idleUs = idleUs,
        restart = None, outName = "sess")
      .writeStream.format("memory").queryName("rws")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(6).getTime)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("rws").collect().map(key).toSet
      assert(streamed == batch,
        s"batch/stream sessions diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  import StreamOpsSpec.EvRow

  /** Run a streaming frame through foreachBatch into a driver buffer
    * (the memory sink can't recover from a checkpoint; foreachBatch
    * can), returning the started query. */
  private def startCollecting(df: org.apache.spark.sql.DataFrame, cp: String,
      buf: scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (b, _) => buf.synchronized { buf ++= b.collect() }
    df.writeStream.option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).foreachBatch(fn).start()
  }

  test("streaming scan survives a checkpoint stop/restart mid-sequence (typed state round-trip)") {
    // THE round-20 gate (VERDICT r19 what's-wrong #1): a sequence opens
    // in run 1 (declared values AND a captured input column in state),
    // the query STOPS, a FRESH COMPILE of the same text restarts from
    // the same checkpoint, and the open sequence completes with the
    // same rows and MATCH IDS as an unbroken batch run — proving the
    // typed row state (scanStateSchema — no kryo) round-trips the
    // state store across query lifetimes.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc
        #| partition by user_id ( scan with_match_id=m declare (v0: real = 0.0, gap: real = -1.0) with (
        #    step s1: true => v0 = value;
        #    step s2: value > s1.value => gap = value - s2.v0;
        #  ) )
        #| project user_id, ts, value, v0, gap, m""".stripMargin('#')
    val fixture = Seq(
      // user 1: sequence opens on 5.0, extends DOWN onto 3.0 (captured
      // row = the 3.0 record) in RUN 1; run 2 promotes on 4.0 (> the
      // CAPTURED s1.value 3.0) closing match id 1, then 9.0 opens id 2
      VEvent(1L, ts(1), 5.0), VEvent(1L, ts(2), 3.0),
      VEvent(1L, ts(3), 4.0), VEvent(1L, ts(4), 9.0),
      // user 2: opens in run 1, never completes
      VEvent(2L, ts(1), 7.0), VEvent(2L, ts(3), 6.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       r.getAs[java.lang.Double]("v0"),
       Option(r.getAs[java.lang.Double]("gap")).map(_.doubleValue),
       r.getAs[Long]("m"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    val cp = java.nio.file.Files.createTempDirectory("scan_restart_cp").toString
    val stream = MemoryStream[VEvent]
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val (b1, b2) = fixture.partition(_.ts.getTime <= ts(2).getTime)
    // ---- run 1: open the sequences, stop mid-machine
    val q1 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    assert(buf.nonEmpty, "run 1 must emit the open-sequence rows (output=all)")
    // ---- run 2: FRESH compile, same checkpoint — state must restore
    val q2 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(b2: _*); q2.processAllAvailable() } finally q2.stop()
    val streamed = buf.map(key).toSet
    assert(streamed == batch,
      s"restart broke the machine:\n  batch=$batch\n  stream=$streamed")
    // the completing row (4.0 closes the run-1 sequence) carries match
    // id 1 — continuity across the restart, not a restarted counter
    assert(streamed.contains((1L, 3L, 3.0, Some(1.0), 1L)),
      s"run-2 completion must carry run-1's match id and captured state: $streamed")
  }

  test("streaming row_window_session survives a checkpoint restart across a re-anchor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc
        #| partition by user_id ( extend sess = row_window_session(ts, 8s, 5s) )
        #| project user_id, ts, sess""".stripMargin('#')
    val fixture = Seq(
      SEvent(1L, ts(0), "a"), SEvent(1L, ts(3), "a"), SEvent(1L, ts(6), "a"),
      SEvent(1L, ts(9), "a"), SEvent(1L, ts(12), "a"),
      SEvent(2L, ts(0), "b"), SEvent(2L, ts(10), "b"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       rel(r.getAs[Timestamp]("sess")))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    val cp = java.nio.file.Files.createTempDirectory("rws_restart_cp").toString
    val stream = MemoryStream[SEvent]
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    // split so the t9 MOVING-ANCHOR re-open happens after the restart,
    // driven by sessStart=0/prevTs=6 restored from the checkpoint
    val (b1, b2) = fixture.partition(_.ts.getTime <= ts(6).getTime)
    val q1 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(b2: _*); q2.processAllAvailable() } finally q2.stop()
    val streamed = buf.map(key).toSet
    assert(streamed == batch,
      s"restart broke sessionization:\n  batch=$batch\n  stream=$streamed")
    assert(streamed.contains((1L, 9L, 9L)),
      s"the post-restart row must re-anchor off restored state: $streamed")
  }

  test("q117 running-scan KQL text: unkeyed single-step machine streams with batch parity") {
    // the SAME q117 text (plus the streaming lateness bound) runs on a
    // MemoryStream (round 20): unkeyed is allowed for the scan family —
    // machine state is bounded (here two declared cells) — through ONE
    // state partition, with secondary order-by columns as in-batch
    // tiebreaks (ts(4) is shared by two rows below; arrival order is
    // scrambled to prove event_id, not arrival, decides)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| where event_type == 'purchase'
        #| order by ts asc, event_id asc
        #| scan declare (total:real = 0.0, last_id:long = 0) with (
        #    step big: value > 50 => total = total + value, last_id = event_id;
        #  )
        #| project event_id, total = round(total, 6), last_id
        #| order by event_id asc""".stripMargin('#')
    val fixture = Seq(
      EvRow(1, ts(1), 1, "purchase", 60.0),
      EvRow(2, ts(2), 1, "view", 80.0),     // dropped by the where
      EvRow(3, ts(3), 1, "purchase", 40.0), // fails the step predicate
      EvRow(4, ts(4), 2, "purchase", 70.5),
      EvRow(5, ts(4), 1, "purchase", 55.0), // ts tie with e4: event_id breaks it
      EvRow(6, ts(6), 2, "purchase", 90.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"), r.getAs[Double]("total"), r.getAs[Long]("last_id"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    assert(batch == Set((1L, 60.0, 1L), (4L, 130.5, 4L), (5L, 185.5, 5L), (6L, 275.5, 6L)),
      s"batch running sum moved: $batch")
    val stream = MemoryStream[EvRow]
    val (streamDf, ws) = graft.kql.KqlCompiler.compileWithWarnings(
      kql, _ => stream.toDS().toDF())
    assert(streamDf.isStreaming)
    assert(ws.exists(_.contains("ONE state partition")), ws.mkString("; "))
    val q = streamDf.writeStream.format("memory").queryName("q117_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // scrambled arrival: the ts(4) tie arrives e5-then-e4
      stream.addData(fixture(2), fixture(0), fixture(1)); q.processAllAvailable()
      stream.addData(fixture(4), fixture(3), fixture(5)); q.processAllAvailable()
      val streamed = spark.table("q117_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"q117 batch/stream diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("q252 running-max KQL text: unkeyed stateful machine streams with batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc, event_id asc
        #| scan declare (mx: real = 0.0) with (
        #    step s1: isnotnull(value) => mx = iff(value > s1.mx, value, s1.mx);
        #  )
        #| project event_id, mx
        #| order by event_id asc""".stripMargin('#')
    val fixture = Seq(
      EvRow(1, ts(1), 1, "a", 4.0), EvRow(2, ts(2), 2, "b", 9.0),
      EvRow(3, ts(3), 1, "a", 7.0), EvRow(4, ts(4), 3, "c", 12.5),
      EvRow(5, ts(5), 2, "b", 3.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"), r.getAs[java.lang.Double]("mx"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    assert(batch == Set((1L, 4.0), (2L, 9.0), (3L, 9.0), (4L, 12.5), (5L, 12.5)),
      s"batch running max moved: $batch")
    val stream = MemoryStream[EvRow]
    val streamDf = graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF())
    val q = streamDf.writeStream.format("memory").queryName("q252_stream")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(fixture(1), fixture(0)); q.processAllAvailable()
      stream.addData(fixture(4), fixture(2), fixture(3)); q.processAllAvailable()
      val streamed = spark.table("q252_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"q252 batch/stream diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("secondary order-by columns pin same-timestamp ties to the batch order") {
    // VERDICT r19 what's-wrong #3: two same-timestamp rows whose
    // CONSUMPTION ORDER changes the machine outcome (one extends, one
    // promotes) arrive in reversed order — the declared event_id
    // tiebreak, not arrival, must decide, matching the batch machine's
    // full multi-column sort.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc, event_id asc
        #| partition by user_id ( scan with_match_id=m declare (v0: real = 0.0, gap: real = -1.0) with (
        #    step s1: true => v0 = value;
        #    step s2: value > s1.v0 => gap = value - s2.v0;
        #  ) )
        #| project user_id, event_id, value, v0, gap, m""".stripMargin('#')
    val fixture = Seq(
      EvRow(1, ts(1), 1, "x", 5.0),
      // the tie: e2 first (batch order) EXTENDS down to 3.0, then e3
      // promotes with gap 9-3=6; consuming e3 first would give gap 4
      EvRow(2, ts(2), 1, "x", 3.0),
      EvRow(3, ts(2), 1, "x", 9.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"), r.getAs[java.lang.Double]("v0"),
       Option(r.getAs[java.lang.Double]("gap")).map(_.doubleValue),
       r.getAs[Long]("m"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    assert(batch.exists { case (id, _, gap, _) => id == 3L && gap == Some(6.0) },
      s"batch must consume the tie in event_id order: $batch")
    val stream = MemoryStream[EvRow]
    val (streamDf, ws) = graft.kql.KqlCompiler.compileWithWarnings(
      kql, _ => stream.toDS().toDF())
    assert(!ws.exists(_.contains("ARRIVAL order")),
      s"declared tiebreaks must silence the tie warning: ${ws.mkString("; ")}")
    val q = streamDf.writeStream.format("memory").queryName("tie_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // one micro-batch, arrival REVERSED vs the declared order
      stream.addData(fixture(2), fixture(1), fixture(0)); q.processAllAvailable()
      val streamed = spark.table("tie_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"tiebreaks diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
  }

  test("KQL sequence_detect over a streaming source: batch/stream parity on the q120 shape") {
    // the q120 class (round 20): the plugin's greedy earliest-anchor
    // kernel replayed as keyed state — completion across a micro-batch
    // split, a budget-expired prefix, a no-step-1 key that recovers,
    // and a boundary-exact step window (<= on both budgets)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| extend s1 = event_type == 'view', s2 = event_type == 'click', s3 = event_type == 'purchase'
        #| evaluate sequence_detect(ts, 10s, 30s, s1, s2, s3) by user_id""".stripMargin('#')
    val fixture = Seq(
      // user 1: completes ACROSS the split (view,click | purchase)
      EvRow(1, ts(0), 1, "view", 0), EvRow(2, ts(5), 1, "click", 0),
      EvRow(3, ts(10), 1, "purchase", 0),
      // user 2: anchored at view@0; click@40 blows both budgets — never
      // completes (greedy earliest anchor never re-seats, same as batch)
      EvRow(4, ts(0), 2, "view", 0), EvRow(5, ts(40), 2, "click", 0),
      EvRow(6, ts(45), 2, "purchase", 0),
      // user 3: a leading click can't anchor; the later full chain does
      EvRow(7, ts(0), 3, "click", 0), EvRow(8, ts(2), 3, "view", 0),
      EvRow(9, ts(4), 3, "click", 0), EvRow(10, ts(6), 3, "purchase", 0),
      // user 4: click exactly AT the 10s step window (inclusive), then
      // purchase inside both budgets
      EvRow(11, ts(0), 4, "view", 0), EvRow(12, ts(10), 4, "click", 0),
      EvRow(13, ts(18), 4, "purchase", 0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("s1")),
       rel(r.getAs[Timestamp]("s2")), rel(r.getAs[Timestamp]("s3")))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    assert(batch == Set((1L, 0L, 5L, 10L), (3L, 2L, 4L, 6L), (4L, 0L, 10L, 18L)),
      s"batch sequence_detect moved: $batch")
    val stream = MemoryStream[EvRow]
    val streamDf = graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF())
    assert(streamDf.isStreaming)
    assert(streamDf.columns.toSeq == Seq("user_id", "s1", "s2", "s3"),
      s"streaming output must keep the plugin's shape: ${streamDf.columns.toSeq}")
    val q = streamDf.writeStream.format("memory").queryName("sd_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(5).getTime)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("sd_stream").collect().map(key).toSet
      assert(streamed == batch,
        s"sequence_detect batch/stream diverge:\n  batch=$batch\n  stream=$streamed")
    } finally q.stop()
    // loud contract: no watermark set → compile error naming the knob
    val noWm = intercept[Exception](graft.kql.KqlCompiler.compile(
      kql.linesIterator.filterNot(_.startsWith("set streaming_watermark"))
        .mkString("\n"), _ => stream.toDS().toDF()))
    assert(noWm.getMessage.contains("streaming_watermark"), noWm.getMessage)
  }

  test("streaming scan restart under the RocksDB state store (the 100 TB provider)") {
    // the default HDFS-backed store keeps state on the JVM heap; a
    // 1000-executor deployment runs RocksDB (off-heap, incremental
    // checkpoints), where state round-trips through RocksDB byte
    // serialization instead of in-memory maps — the typed row state
    // must survive a stop/restart there too
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.VEvent
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| order by ts asc
        #| partition by user_id ( scan with_match_id=m declare (v0: real = 0.0, gap: real = -1.0) with (
        #    step s1: true => v0 = value;
        #    step s2: value > s1.value => gap = value - s2.v0;
        #  ) )
        #| project user_id, ts, value, v0, gap, m""".stripMargin('#')
    val fixture = Seq(
      VEvent(1L, ts(1), 5.0), VEvent(1L, ts(2), 3.0),
      VEvent(1L, ts(3), 4.0), VEvent(1L, ts(4), 9.0),
      VEvent(2L, ts(1), 7.0), VEvent(2L, ts(3), 6.0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("ts")),
       r.getAs[java.lang.Double]("v0"),
       Option(r.getAs[java.lang.Double]("gap")).map(_.doubleValue),
       r.getAs[Long]("m"))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val cp = java.nio.file.Files.createTempDirectory("scan_rocks_cp").toString
      val stream = MemoryStream[VEvent]
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val (b1, b2) = fixture.partition(_.ts.getTime <= ts(2).getTime)
      val q1 = startCollecting(
        graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
      try { stream.addData(b1: _*); q1.processAllAvailable() } finally q1.stop()
      val q2 = startCollecting(
        graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
      try { stream.addData(b2: _*); q2.processAllAvailable() } finally q2.stop()
      val streamed = buf.map(key).toSet
      assert(streamed == batch,
        s"RocksDB restart broke the machine:\n  batch=$batch\n  stream=$streamed")
      assert(streamed.contains((1L, 3L, 3.0, Some(1.0), 1L)),
        s"run-2 completion must carry run-1's state through RocksDB: $streamed")
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("KQL sequence_detect survives a checkpoint stop/restart mid-chain") {
    // the matched-prefix timestamps (flat product state) must restore
    // across query lifetimes: view+click land in run 1, the purchase
    // that completes the chain arrives after a restart from the same
    // checkpoint under a FRESH compile of the same text
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val kql =
      """set streaming_watermark = 5s;
        #t
        #| extend s1 = event_type == 'view', s2 = event_type == 'click', s3 = event_type == 'purchase'
        #| evaluate sequence_detect(ts, 10s, 30s, s1, s2, s3) by user_id""".stripMargin('#')
    val fixture = Seq(
      EvRow(1, ts(0), 1, "view", 0), EvRow(2, ts(5), 1, "click", 0),
      EvRow(3, ts(10), 1, "purchase", 0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("user_id"), rel(r.getAs[Timestamp]("s1")),
       rel(r.getAs[Timestamp]("s2")), rel(r.getAs[Timestamp]("s3")))
    val batch = graft.kql.KqlCompiler.compile(kql, _ => fixture.toDF())
      .collect().map(key).toSet
    val cp = java.nio.file.Files.createTempDirectory("sd_restart_cp").toString
    val stream = MemoryStream[EvRow]
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q1 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(fixture(0), fixture(1)); q1.processAllAvailable() } finally q1.stop()
    assert(buf.isEmpty, "no completion before the last step")
    val q2 = startCollecting(
      graft.kql.KqlCompiler.compile(kql, _ => stream.toDS().toDF()), cp, buf)
    try { stream.addData(fixture(2)); q2.processAllAvailable() } finally q2.stop()
    val streamed = buf.map(key).toSet
    assert(streamed == batch && batch == Set((1L, 0L, 5L, 10L)),
      s"restart broke sequence_detect:\n  batch=$batch\n  stream=$streamed")
  }

  test("statefulSequenceMatch: completion across batches, restart, gap expiry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = StreamOps.statefulSequenceMatch(stream.toDS(), "5 seconds",
        Seq("view", "click", "purchase"), totalGapMs = 30000L)
      .writeStream.format("memory").queryName("seq_match").outputMode(OutputMode.Append).start()
    try {
      // user 1: prefix in batch 1, completion in batch 2 (state carries)
      // user 3: TWO full chains in one batch -> restart finds both
      stream.addData(
        SEvent(1, ts(0), "view"), SEvent(1, ts(5), "click"),
        SEvent(3, ts(0), "view"), SEvent(3, ts(1), "click"), SEvent(3, ts(2), "purchase"),
        SEvent(3, ts(3), "view"), SEvent(3, ts(4), "click"), SEvent(3, ts(5), "purchase"))
      q.processAllAvailable()
      stream.addData(SEvent(1, ts(10), "purchase"))
      q.processAllAvailable()
      // user 2: view@0, then the purchase budget expires (gap 30s) before
      // click@40 — the prefix must NOT survive into a completion, but a
      // fresh full chain after expiry must
      stream.addData(SEvent(2, ts(0), "view"), SEvent(2, ts(40), "click"))
      q.processAllAvailable()
      stream.addData(SEvent(2, ts(50), "view"), SEvent(2, ts(52), "click"), SEvent(2, ts(54), "purchase"))
      q.processAllAvailable()
      val rows = spark.table("seq_match").as[StreamOps.SeqMatchOut].collect()
        .map(m => (m.user_id, m.step_ts.map(rel), m.duration_ms)).toSet
      assert(rows == Set(
        (1L, Seq(0L, 5L, 10L), 10000L),
        (3L, Seq(0L, 1L, 2L), 2000L),
        (3L, Seq(3L, 4L, 5L), 2000L),
        (2L, Seq(50L, 52L, 54L), 4000L)), s"got $rows")
    } finally q.stop()
  }

  test("batch sequence_detect and streaming matcher agree (surface parity on first completions)") {
    // The two sequence surfaces must not drift: batch sequence_detect
    // (greedy earliest completion per key under step/total gap budgets)
    // and the streaming matcher (all sequential completions under the
    // total gap) agree wherever their contracts overlap — each key
    // completes at most once and only the total budget binds. One
    // fixture, both engines, same matches: completions with distractor
    // events interleaved, a prefix killed by the gap budget, an
    // out-of-order key that never completes, and a completion exactly
    // AT the gap boundary (<= on both sides).
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val fixture = Seq(
      SEvent(1, ts(0), "view"), SEvent(1, ts(1), "view"), SEvent(1, ts(2), "error"),
      SEvent(1, ts(3), "click"), SEvent(1, ts(7), "purchase"),
      SEvent(2, ts(0), "view"), SEvent(2, ts(40), "click"), SEvent(2, ts(45), "purchase"),
      SEvent(4, ts(0), "purchase"), SEvent(4, ts(1), "click"), SEvent(4, ts(2), "view"),
      SEvent(5, ts(0), "view"), SEvent(5, ts(10), "click"), SEvent(5, ts(30), "purchase"))
    val gapUs = 30L * 1000 * 1000
    val batch = graft.ops.Funnel.sequenceDetect(
      fixture.toDF(), "user_id", col("ts"),
      Seq("view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "purchase" -> (col("event_type") === "purchase")),
      stepWindowUs = gapUs, totalGapUs = gapUs)
    val batchSet = batch.collect().map(r =>
      (r.getLong(0), Seq(rel(r.getTimestamp(1)), rel(r.getTimestamp(2)), rel(r.getTimestamp(3))))).toSet
    val stream = MemoryStream[SEvent]
    val q = StreamOps.statefulSequenceMatch(stream.toDS(), "5 seconds",
        Seq("view", "click", "purchase"), totalGapMs = 30000L)
      .writeStream.format("memory").queryName("seq_parity").outputMode(OutputMode.Append).start()
    val streamSet =
      try {
        stream.addData(fixture: _*)
        q.processAllAvailable()
        spark.table("seq_parity").as[StreamOps.SeqMatchOut].collect()
          .map(m => (m.user_id, m.step_ts.map(rel))).toSet
      } finally q.stop()
    assert(batchSet == Set((1L, Seq(0L, 3L, 7L)), (5L, Seq(0L, 10L, 30L))),
      s"batch matches: $batchSet")
    assert(streamSet == batchSet, s"stream $streamSet must equal batch $batchSet")
  }

  test("streamingHeavyHitters: sketch+leaders state, trimmed value re-enters with full estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = StreamOps.streamingHeavyHitters(stream.toDS(), "5 seconds", 2)
      .writeStream.format("memory").queryName("hh").outputMode(OutputMode.Update).start()
    try {
      // batch 1: user 7 ×3, user 8 ×2, user 9 ×1 under one key
      stream.addData(
        (Seq.fill(3)(7L) ++ Seq.fill(2)(8L) ++ Seq(9L)).zipWithIndex
          .map { case (u, i) => SEvent(u, ts(i), "click") }: _*)
      q.processAllAvailable()
      val b1 = spark.table("hh").as[StreamOps.HeavyOut].collect()
        .map(h => (h.value, h.est, h.rank)).toSet
      assert(b1 == Set(("7", 3L, 1), ("8", 2L, 2)), s"got $b1")
      // batch 2: user 9 surges past both — it was TRIMMED from the
      // leader board, but the sketch remembers its batch-1 count, so it
      // re-enters at 1 + 5 = 6
      stream.addData((10 until 15).map(i => SEvent(9L, ts(i), "click")): _*)
      q.processAllAvailable()
      val b2 = spark.table("hh").as[StreamOps.HeavyOut].collect()
        .map(h => (h.value, h.est, h.rank)).toSet
      assert(b2.contains(("9", 6L, 1)), s"trimmed value must re-enter with its sketch estimate, got $b2")
      // per-key isolation: a different event_type starts fresh
      stream.addData(SEvent(7L, ts(20), "view"))
      q.processAllAvailable()
      val views = spark.table("hh").as[StreamOps.HeavyOut].collect()
        .filter(_.event_type == "view").map(h => (h.value, h.est, h.rank)).toSet
      assert(views == Set(("7", 1L, 1)), s"got $views")
    } finally q.stop()
  }
}

object StreamOpsSpec {
  /** events-table row shape for the KQL-text streaming gates (round
    * 20) — top-level so Spark can derive its product encoder. */
  final case class EvRow(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
}
