package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the engine's record stream.
  *
  * The reference delegates ALL event-time work to the target database
  * (reference: README.md:158-162 — "The connector does not support
  * transformers"; SURVEY §2.3 notes it has no watermarks, windows, or
  * keyed state). A Spark-native engine gets these from Structured
  * Streaming, so they are first-class here: watermarked tumbling /
  * sliding / session windows, streaming deduplication, and custom keyed
  * state via `flatMapGroupsWithState`.
  *
  * Scale notes (100 TB / 1000-executor stance):
  *  - every op below keys its state by a grouping column, so state is
  *    hash-partitioned across executors and bounded by the watermark —
  *    no unbounded growth, no driver-side state;
  *  - watermarks bound both late-data buffering and state eviction; the
  *    session operator additionally re-emits nothing after close, so
  *    downstream sinks can be append-only;
  *  - all window aggregations are partial+final (map-side combine) like
  *    any Spark agg — the shuffle carries one row per (key, window) per
  *    partition, not per event.
  */
object StreamOps {

  /** Tumbling event-time window counts/aggregates. Works on batch and
    * streaming frames alike (same Catalyst operator); on a stream the
    * watermark drops events later than `delayThreshold` and evicts
    * closed windows from state. */
  def tumblingCounts(df: DataFrame, tsCol: String, delayThreshold: String,
                     windowDuration: String, keyCols: String*): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, delayThreshold) else df
    wm.groupBy(window(col(tsCol), windowDuration) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keyCols.map(col) :+ col("n_events"): _*)
  }

  /** Sliding event-time windows (duration > slide ⇒ overlapping): each
    * event lands in duration/slide windows; Spark expands this map-side,
    * so the shuffle still carries aggregated (key, window) rows. */
  def slidingAgg(df: DataFrame, tsCol: String, delayThreshold: String,
                 windowDuration: String, slideDuration: String,
                 aggCol: String, keyCols: String*): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, delayThreshold) else df
    wm.groupBy(window(col(tsCol), windowDuration, slideDuration) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(aggCol)).as("total"))
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keyCols.map(col) :+ col("n_events") :+ col("total"): _*)
  }

  /** Session windows with a fixed inactivity gap — the declarative
    * (Catalyst `session_window`) form. Spark merges overlapping
    * per-event windows into sessions inside the agg operator; state per
    * key is one open session, evicted once the watermark passes
    * session end + gap. */
  def sessionWindowAgg(df: DataFrame, tsCol: String, delayThreshold: String,
                       gap: String, keyCols: String*): DataFrame = {
    val wm = if (df.isStreaming) df.withWatermark(tsCol, delayThreshold) else df
    wm.groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        keyCols.map(col) :+ col("n_events"): _*)
  }

  /** Streaming deduplication bounded by the watermark: the first record
    * per key wins; duplicates arriving within the watermark horizon are
    * dropped, and key state is evicted once the watermark passes — the
    * scale-safe form of streaming `dropDuplicates` (unbounded key state
    * is a 100-TB foot-gun). */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, delayThreshold: String,
                           keyCols: String*): DataFrame =
    df.withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Streaming NEAR-dup dedup: drop documents whose content signature
    * (e.g. `simhash32(text)` or `minhash_sig(text)` — any deterministic
    * signature expression; register [[graft.functions.GraftFunctions]]
    * first) matches an earlier document inside the watermark horizon.
    * The signature is computed map-side by the native expression, so
    * state per signature is one row key, hash-partitioned and
    * watermark-evicted — the streaming complement of batch q22/q23:
    * exact near-dup clustering needs the batch pass; this keeps the
    * stream itself from flooding downstream with boilerplate copies. */
  def dedupBySignature(df: DataFrame, tsCol: String, delayThreshold: String,
                       signature: Column): DataFrame =
    df.withColumn("__sig", signature)
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(Seq("__sig"))
      .drop("__sig")

  /** Stream-stream enrichment join: facts joined against a (slowly
    * updating) dimension STREAM within an event-time band — the
    * streaming analogue of the q42 as-of lookup for when the dimension
    * itself arrives as a stream (e.g. metadata updates on a topic).
    * Both sides are watermarked and the join carries a time-range
    * condition, so Spark can bound the buffered state on BOTH sides and
    * evict rows the watermark has passed — the only state-safe
    * stream-stream join shape (an unconditioned stream join buffers
    * forever). Inner by default; "leftOuter" emits unmatched facts with
    * nulls once the watermark proves no match can arrive. State is
    * hash-partitioned by the join key like any keyed stream state. */
  def enrichJoin(facts: DataFrame, dims: DataFrame, key: String,
                 factsTs: String, dimsTs: String,
                 delayThreshold: String, lookback: String,
                 joinType: String = "inner"): DataFrame = {
    val f = facts.withWatermark(factsTs, delayThreshold)
    val d = dims.withWatermark(dimsTs, delayThreshold)
      .withColumnRenamed(key, s"__dim_$key")
    f.join(d,
      col(key) === col(s"__dim_$key") &&
        col(dimsTs) <= col(factsTs) &&
        col(dimsTs) >= col(factsTs) - expr(s"INTERVAL $lookback"),
      joinType).drop(s"__dim_$key")
  }

  // ------------------------------------------------ custom keyed state

  final case class SEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(startMs: Long, endMs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long)

  /** Custom keyed-state sessionization via `flatMapGroupsWithState`:
    * the imperative form of [[sessionWindowAgg]] for semantics the
    * declarative operator can't express (e.g. emitting exactly one row
    * per CLOSED session, never a partial). Sessions close after `gapMs`
    * of event-time inactivity, enforced with an event-time timeout tied
    * to the watermark.
    *
    * State is one `SessionState` per live user — bytes per key, hash
    * partitioned, watermark-evicted: safe at any key cardinality the
    * cluster's aggregate memory can hold live (not total) users. */
  def statefulSessions(events: Dataset[SEvent], delayThreshold: String,
                       gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session is closed, emit it
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents))
          } else {
            val sorted = rows.toVector.sortBy(_.ts.getTime)
            var closed = Vector.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(s.copy(endMs = math.max(s.endMs, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed :+= SessionOut(uid, new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  final case class HHState(cm: Array[Byte], leaders: Map[String, Long])
  final case class HeavyOut(event_type: String, value: String, est: Long, rank: Int)

  /** Streaming heavy hitters — the count-min sketch ([[graft.functions
    * .CountMinOps]]) composed with Structured Streaming state: per key
    * (event_type here), a bounded sketch absorbs every value ever seen
    * and a k-entry leader board tracks the current top values by sketch
    * estimate. Emits the full refreshed top-k per group per batch
    * (Update mode).
    *
    * State per group is FIXED-SIZE forever: the 8 KB sketch + k leader
    * entries — the property that makes per-key heavy-hitter tracking
    * viable over an unbounded stream where exact per-value counts would
    * grow with cardinality. The leader board is space-saving style: a
    * trimmed value that keeps occurring re-enters with its full sketch
    * estimate (count-min never undercounts), so sustained heavy hitters
    * cannot be starved by an early trim — only transiently-hot values
    * fade, which is the approximation's documented contract. Ties pin
    * to (estimate DESC, value ASC) so emissions are deterministic. */
  def streamingHeavyHitters(events: Dataset[SEvent], delayThreshold: String,
                            k: Int): Dataset[HeavyOut] = {
    require(k > 0, "k must be positive")
    import events.sparkSession.implicits._
    import graft.functions.CountMinOps
    import org.apache.spark.unsafe.types.UTF8String
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HHState, HeavyOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype, rows, state) =>
          val buf = state.getOption.map(s => CountMinOps.deserialize(s.cm))
            .getOrElse(CountMinOps.empty())
          var leaders = state.getOption.map(_.leaders).getOrElse(Map.empty[String, Long])
          rows.foreach { e =>
            val v = e.user_id.toString
            val u = UTF8String.fromString(v)
            CountMinOps.add(buf, u)
            leaders += v -> CountMinOps.estimate(buf, u)
          }
          val top = leaders.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
          state.update(HHState(CountMinOps.serialize(buf), top.toMap))
          top.zipWithIndex.map { case ((v, c), i) => HeavyOut(etype, v, c, i + 1) }.iterator
      }
  }

  final case class SeqState(stepMs: Vector[Long])
  final case class SeqMatchOut(user_id: Long, step_ts: Seq[Timestamp], duration_ms: Long)

  /** Streaming sequence matcher — the scan/funnel/sequence_detect family
    * over an unbounded stream: per key, match the ordered `steps` (on
    * `event_type`) with the whole sequence bounded by `totalGapMs`, emit
    * one row per COMPLETED sequence and restart — so unlike the batch
    * operators (single earliest instance), the stream finds every
    * sequential non-overlapping completion, the semantics a monitoring
    * pipeline actually wants.
    *
    * State is the matched-prefix timestamps (≤ steps.length longs per
    * live key) and is evicted PRECISELY: a partial sequence registers an
    * event-time timeout at t1 + totalGapMs — past that point no event
    * inside the gap bound can still arrive, so the partial can never
    * complete and the state drops. Matching is greedy in watermark order
    * (events sort within each micro-batch; cross-batch stragglers bound
    * by the watermark cannot retroactively extend an expired prefix) —
    * the standard streaming trade-off, documented. */
  def statefulSequenceMatch(events: Dataset[SEvent], delayThreshold: String,
                            steps: Seq[String], totalGapMs: Long): Dataset[SeqMatchOut] = {
    require(steps.nonEmpty, "sequence match needs at least one step")
    require(totalGapMs > 0, "totalGapMs must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, SeqMatchOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed t1 + gap: the partial can never complete
            state.remove(); Iterator.empty
          } else {
            var cur = state.getOption.map(_.stepMs).getOrElse(Vector.empty[Long])
            val out = Vector.newBuilder[SeqMatchOut]
            rows.toVector.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              // an instance whose gap budget this event overruns is dead
              // for every later event too — expire it before matching
              if (cur.nonEmpty && t - cur.head > totalGapMs) cur = Vector.empty
              val k = cur.length
              if (k < steps.length && e.event_type == steps(k) &&
                  (cur.isEmpty || t > cur.last)) {
                cur = cur :+ t
                if (cur.length == steps.length) {
                  out += SeqMatchOut(uid, cur.map(new Timestamp(_)), cur.last - cur.head)
                  cur = Vector.empty // restart: the next completion can begin
                }
              }
            }
            if (cur.isEmpty) state.remove()
            else {
              state.update(SeqState(cur))
              // timeouts must sit above the current watermark
              state.setTimeoutTimestamp(
                math.max(cur.head + totalGapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  final case class VEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class ScanPairState(open: Boolean, v0: Double, curId: Long,
                                 nextId: Long, lastMs: Long)
  final case class ScanPairOut(user_id: Long, ts: Timestamp, step: String,
                               v0: Double, gap: Option[Double], m: Long)

  /** Streaming counterpart of the STATEFUL scan machine
    * ([[graft.ops.Funnel.scanStateful]]) for the two-step
    * state-reference pattern (the q252/q253 class):
    *
    *   step s1: true          => v0 = value;
    *   step s2: value > s1.v0 => gap = value - s2.v0;
    *
    * i.e. s2's PREDICATE reads step 1's live state and its ASSIGNMENT
    * reads the post-move state — the two resolution rules the batch
    * machine pins. Per key the transition mirrors the batch
    * highest-step-first consumption exactly: an arriving value that
    * beats the open sequence's v0 promotes (emit s2 row with the gap,
    * retire, id consumed); otherwise the row is consumed by s1 —
    * extending the open sequence (v0 reassigned, same match id) or
    * starting a new one (next id). Every consumed row emits (scan's
    * output=all), s1 rows with a null gap.
    *
    * Streaming trade (same as [[statefulSequenceMatch]]): rows order by
    * event time within each micro-batch, and state lives until the
    * watermark passes lastEvent + horizonMs (event-time timeout), so a
    * batch/stream parity holds for in-watermark data — pinned by
    * StreamOpsSpec against the batch machine on a shared fixture. */
  def streamingScanPairs(events: Dataset[VEvent], delayThreshold: String,
                         horizonMs: Long): Dataset[ScanPairOut] = {
    require(horizonMs > 0, "horizonMs must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScanPairState, ScanPairOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(ScanPairState(false, 0.0, 0L, 1L, 0L))
            val out = Vector.newBuilder[ScanPairOut]
            rows.toVector.sortBy(_.ts.getTime).foreach { e =>
              if (st.open && e.value > st.v0) {
                // promote into the last step: assign sees post-move
                // state, emit, retire (the batch machine's completion)
                out += ScanPairOut(uid, e.ts, "s2", st.v0, Some(e.value - st.v0), st.curId)
                st = st.copy(open = false, lastMs = e.ts.getTime)
              } else {
                // s1 consumes: extend keeps the id, start takes the next
                val (id, nxt) =
                  if (st.open) (st.curId, st.nextId) else (st.nextId, st.nextId + 1)
                st = ScanPairState(open = true, v0 = e.value, curId = id,
                  nextId = nxt, lastMs = e.ts.getTime)
                out += ScanPairOut(uid, e.ts, "s1", e.value, None, id)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  final case class LshBucketState(keeper: Long, lastMs: Long)
  final case class LshCand(bucket: String, keeper: Long, candidate: Long)

  /** Streaming LSH candidate-pair generator — the streaming front end of
    * the batch q22 near-dup machinery: documents arrive with their LSH
    * band keys (computed map-side by the batch expressions —
    * minhash_sig + banding; any deterministic `array<string>` of bucket
    * keys works), each bucket keeps its FIRST document as the keeper,
    * and every later same-bucket arrival emits a (bucket, keeper,
    * candidate) pair for downstream exact verification (the batch
    * est-Jaccard join — candidates only, never corpus×corpus).
    *
    * State per bucket is ONE (keeper id, last-seen) entry, hash
    * partitioned, evicted `horizonMs` of event time after the bucket
    * last fired (event-time timeout above the watermark) — fixed bytes
    * per live bucket, the same bounded-state contract as the other
    * keyed operators here. Within a batch, arrivals order by
    * (ts, doc_id) so keeper election is deterministic. */
  def lshCandidatePairs(docs: DataFrame, tsCol: String, delayThreshold: String,
                        docIdCol: String, bandKeys: Column,
                        horizonMs: Long): Dataset[LshCand] = {
    require(horizonMs > 0, "horizonMs must be positive")
    import docs.sparkSession.implicits._
    docs
      .withWatermark(tsCol, delayThreshold)
      .select(col(tsCol).as("__ts"), col(docIdCol).cast("long").as("__doc"),
        explode(bandKeys).as("__bucket"))
      .as[(Timestamp, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[LshBucketState, LshCand](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toVector.sortBy(r => (r._1.getTime, r._2))
            var cur = state.getOption
            val out = Vector.newBuilder[LshCand]
            sorted.foreach { case (ts, doc, _) =>
              cur match {
                case Some(s) =>
                  if (doc != s.keeper) out += LshCand(bucket, s.keeper, doc)
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, ts.getTime)))
                case None =>
                  cur = Some(LshBucketState(doc, ts.getTime))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max(s.lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming incremental dedup — the streaming complement of the
    * q202 snapshot form: classify each ARRIVING document against a
    * STATIC corpus index as `exact` (content hash present in the
    * index), `near` (shares a banded-minhash bucket with an index doc
    * whose 12-lane est-Jaccard ≥ 0.5 — the q22/q202 decision), or
    * `kept`. Emits ONE row per arrival with its verdict, append mode.
    *
    * Scale/state shape: the corpus side pre-aggregates ONCE into (a)
    * the distinct content-hash set and (b) a band-bucket → capped
    * signature-list index (a bucket keeps its first `bandCap` members
    * by doc id — a dense near-dup cluster needs only enough members to
    * witness membership; q202 caps the same way on bucket size); both
    * are static dims that broadcast into stream-static joins. The
    * stream side is MAP-ONLY: signature, content hash, and the four
    * band keys are computed as COLUMNS (no explode), looked up with
    * four broadcast left joins, and the near decision is a per-row
    * fold over ≤ 4·bandCap candidate signatures — ZERO streaming
    * state, and per-arrival work independent of corpus size.
    *
    * Precondition: `minhash_sig` must be registered on the session
    * (graft.functions.GraftFunctions.registerMinhash — the q22 lanes).
    * Documents under 3 words carry no signature (no shingles) and can
    * only be exact or kept, matching the batch form. */
  def streamingIncrementalDedup(stream: DataFrame, docIdCol: String, textCol: String,
                                corpus: DataFrame, bandCap: Int): DataFrame = {
    require(bandCap > 0, "bandCap must be positive")
    def bandKey(mh: Column, b: Int): Column =
      md5(concat_ws(",",
        element_at(mh, b * 3 + 1).cast("string"),
        element_at(mh, b * 3 + 2).cast("string"),
        element_at(mh, b * 3 + 3).cast("string")))
    // ---- static index (built once; dims broadcast) ----
    val hashes = corpus.select(md5(lower(col(textCol))).as("__h"))
      .distinct().withColumn("__exact", lit(true))
    val sig = corpus
      .where(size(split(lower(col(textCol)), "\\s+")) >= 3)
      .select(col(docIdCol).cast("long").as("__cid"),
        expr(s"minhash_sig($textCol)").as("__cmh"))
    val bandWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"), col("__bh")).orderBy(col("__cid"))
    val idx = sig
      .select(col("__cid"), col("__cmh"),
        explode(array((0 to 3).map(b =>
          struct(lit(b).as("__b"), bandKey(col("__cmh"), b).as("__bh"))): _*)).as("__e"))
      .select(col("__cid"), col("__cmh"), col("__e.__b").as("__b"), col("__e.__bh").as("__bh"))
      .withColumn("__rn", row_number().over(bandWin))
      .where(col("__rn") <= bandCap)
      .groupBy(col("__b"), col("__bh"))
      .agg(collect_list(col("__cmh")).as("__sigs"))
    // ---- map-only stream side ----
    var s = stream
      .withColumn("__mh", expr(s"minhash_sig($textCol)"))
      .withColumn("__h", md5(lower(col(textCol))))
    for (b <- 0 to 3) s = s.withColumn(s"__bh$b", bandKey(col("__mh"), b))
    var joined = s.join(broadcast(hashes), Seq("__h"), "left")
    for (b <- 0 to 3) {
      val idxB = idx.where(col("__b") === b)
        .select(col("__bh").as(s"__bh$b"), col("__sigs").as(s"__sigs$b"))
      joined = joined.join(broadcast(idxB), Seq(s"__bh$b"), "left")
    }
    val emptySigs = "cast(array() as array<array<bigint>>)"
    val near = expr(
      s"""exists(
            concat(coalesce(__sigs0, $emptySigs), coalesce(__sigs1, $emptySigs),
                   coalesce(__sigs2, $emptySigs), coalesce(__sigs3, $emptySigs)),
            s -> size(filter(sequence(0, 11), k -> element_at(s, k + 1) = element_at(__mh, k + 1)))
                   / cast(12 as double) >= 0.5)""")
    joined
      .withColumn("verdict",
        when(coalesce(col("__exact"), lit(false)), "exact")
          .when(size(split(lower(col(textCol)), "\\s+")) >= 3 && coalesce(near, lit(false)), "near")
          .otherwise("kept"))
      .select(stream.columns.map(col) :+ col("verdict"): _*)
  }
}
