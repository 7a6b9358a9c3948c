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

  /** Persisted per-key state SCHEMA of [[streamingScanStateful]] (round
    * 20 — an explicit Catalyst row schema replacing the round-19
    * `Encoders.kryo[Array[Array[Any]]]` encoding, which was opaque
    * binary: a field reorder or Scala/kryo version drift between the
    * run that wrote a state-store snapshot and the run that restores it
    * would deserialize garbage SILENTLY; a typed row either restores
    * exactly or fails loudly on schema mismatch). Per step k:
    * `s$k` = nullable struct of the declared values (their DECLARED
    * Catalyst types) plus the match id — present iff a sequence sits at
    * step k; `c$k` = nullable struct of ONLY the captured-row fields
    * some non-declared StateRef actually reads at step k (the runtime's
    * per-step slot list) — the rest of the record last consumed is dead
    * weight for the machine, so persisted state is O(steps × (declares
    * + referenced fields)) per key, INDEPENDENT of input row width.
    * Plus `nextId` (match-id continuity) and `lastMs` (eviction clock).
    * Checkpoint-restart round-trips are pinned by StreamOpsSpec. */
  private def scanStateSchema(n: Int,
      declDts: Seq[org.apache.spark.sql.types.DataType],
      capSlots: Array[Array[(Int, org.apache.spark.sql.types.DataType)]])
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(
      (0 until n).flatMap { k =>
        Seq(
          StructField(s"s$k", StructType(
            declDts.zipWithIndex.map { case (dt, i) =>
              StructField(s"d$i", dt, nullable = true) } :+
            StructField("mid", LongType, nullable = false)), nullable = true),
          StructField(s"c$k", StructType(
            capSlots(k).zipWithIndex.map { case ((_, dt), i) =>
              StructField(s"f$i", dt, nullable = true) }), nullable = true))
      } :+ StructField("nextId", LongType, nullable = false)
        :+ StructField("lastMs", LongType, nullable = false))
  }

  /** Streaming counterpart of the GENERAL stateful scan machine: consumes
    * the same machine description as [[graft.ops.Funnel.scanStateful]] —
    * `declares` (name, type, default), [[graft.ops.Funnel.StatefulStep]]s
    * whose cond/assign Columns may reference live state through
    * `__scan_state_<j>__<f>` attributes, and the
    * [[graft.ops.Funnel.StateRef]] list describing those attributes — so
    * ANY scan shape the batch compiler produces has a streaming path
    * (round 19; the round-18 runner hard-coded the two-step q253
    * machine).
    *
    * Semantics: the exact batch transition kernel (promote > extend >
    * new, highest step first; predicates see pre-consumption state,
    * assignments see post-move state with pre-commit declared values,
    * committed atomically; promotion into the last step emits and
    * retires), replayed per key per micro-batch over event-time-sorted
    * rows. Expressions are bound ONCE on the driver against the input
    * schema extended with the state-reference fields — the same binding
    * as the batch machine — and JIT-compiled once per task (transient
    * lazy); per-row evaluation is a codegen'd Predicate /
    * MutableProjection over a JoinedRow, never interpreted reflection.
    *
    * Streaming trade (same as [[statefulSequenceMatch]]): rows order by
    * `tsCol` ASCENDING (nulls first) WITHIN each micro-batch — then by
    * the optional `tiebreaks` (column name, ascending) so same-timestamp
    * rows consume deterministically; residual ties keep arrival order —
    * and per-key machine state lives until the watermark passes
    * lastEvent + horizonMs (event-time timeout). Batch/stream parity
    * holds for in-watermark data, pinned by StreamOpsSpec on shared
    * fixtures (the two-step q253 machine and a three-step output=last
    * machine), and across a checkpoint stop/restart.
    *
    * `keyCols` empty routes the WHOLE stream through ONE state
    * partition (machine state stays bounded — O(steps × (declares +
    * referenced fields)) — but throughput is single-task): the opt-in
    * unkeyed running-accumulator shape (q117/q252 class); the KQL
    * compiler warns loudly. */
  /** Tiebreak columns must compare through `java.lang.Comparable` in
    * Scala external form — the atomic orderable types. */
  private[graft] def tiebreakOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType | BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | DateType | TimestampType | TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  def streamingScanStateful(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delayThreshold: String, horizonMs: Long,
      declares: Seq[(String, org.apache.spark.sql.types.DataType, Column)],
      steps: Seq[graft.ops.Funnel.StatefulStep],
      stateRefs: Seq[graft.ops.Funnel.StateRef],
      matchIdCol: Option[String],
      tiebreaks: Seq[(String, Boolean)] = Nil): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSeq, BindReferences, Expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    import org.apache.spark.sql.catalyst.plans.logical.Project
    require(steps.nonEmpty, "scan needs at least one step")
    require(horizonMs > 0, "horizonMs must be positive")
    stateRefs.find(r => r.step < 0 || r.step >= steps.size).foreach(r =>
      throw new IllegalArgumentException(
        s"scan state reference '${r.field}' names step ${r.step} of a ${steps.size}-step machine"))
    val evalSchema = df.schema
    (declares.map(_._1) ++ matchIdCol).find(df.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"scan declared column '$c' collides with an input column"))
    val declIdx = declares.map(_._1).zipWithIndex.toMap
    steps.flatMap(_.assigns.map(_._1)).find(v => !declIdx.contains(v)).foreach(v =>
      throw new IllegalArgumentException(s"scan assignment to undeclared variable '$v'"))
    val spark = df.sparkSession
    // the evaluation schema every step expression binds against — the
    // input row's fields, then one nullable field per state reference
    // (identical to the batch machine's binding, minus its shuffle key)
    val extSchema = StructType(evalSchema.fields ++ stateRefs.map(r =>
      StructField(s"__scan_state_${r.step}__${r.field}", r.dt, nullable = true)))
    def bound(c: Column, what: String): Expression = {
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.AttributeReference
      val dere = GraftColumnBridge.catalystExpression(c).transformUp {
        case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
      }
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], extSchema)
      val analyzed = empty.select(GraftColumnBridge.column(dere).as("__sf_e"))
        .queryExecution.analyzed
      val expr = analyzed.asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
      if (expr.exists(_.isInstanceOf[AggregateExpression]))
        throw new IllegalArgumentException(s"scan $what cannot contain an aggregate")
      BindReferences.bindReference(expr, AttributeSeq(analyzed.children.head.output))
    }
    val condExprs = steps.map(s => bound(s.cond, s"step '${s.name}' predicate"))
    val assignExprs: Array[Array[(Int, Expression, DataType)]] = steps.map { s =>
      s.assigns.map { case (v, rhs) =>
        val dt = declares(declIdx(v))._2
        (declIdx(v), bound(rhs.cast(dt), s"assignment to '$v'"), dt)
      }.toArray
    }.toArray
    val defaultExprs: Array[(Expression, DataType)] = declares.map { case (v, dt, dflt) =>
      (bound(dflt.cast(dt), s"declare default of '$v'"), dt)
    }.toArray
    val outSchema = StructType(
      df.schema.fields.toSeq ++
        declares.map { case (v, dt, _) => StructField(v, dt, nullable = true) } ++
        matchIdCol.map(m => StructField(m, LongType, nullable = false)))
    val refStep = stateRefs.map(_.step).toArray
    val refIsDecl = stateRefs.map(_.isDeclared).toArray
    val refOrd = stateRefs.map(r =>
      if (r.isDeclared) declIdx(r.field) else evalSchema.fieldIndex(r.field)).toArray
    val refDt = stateRefs.map(_.dt).toArray
    // the only captured-row fields the machine can ever read at step k:
    // input ordinals referenced by a non-declared StateRef of that step.
    // Captures are SLIMMED to these slots, so per-key state size is
    // independent of the input row width at 100 TB stream scale.
    val capSlots: Array[Array[(Int, DataType)]] =
      Array.tabulate(steps.size)(k =>
        refStep.indices.filter(i => refStep(i) == k && !refIsDecl(i))
          .map(i => (refOrd(i), refDt(i))).distinct.toArray)
    val tbIdx = tiebreaks.map { case (nm, _) => evalSchema.fieldIndex(nm) }.toArray
    tiebreaks.foreach { case (nm, _) =>
      if (!tiebreakOrderable(evalSchema(nm).dataType))
        throw new IllegalArgumentException(
          s"streaming scan tiebreak column '$nm' has unorderable type " +
          evalSchema(nm).dataType.simpleString)
    }
    val runtime = new ScanMachineRuntime(
      evalSchema = evalSchema,
      condExprs = condExprs,
      assignExprs = assignExprs,
      defaultExprs = defaultExprs,
      emitStep = steps.map(_.emit).toArray,
      declDts = declares.map(_._2).toArray,
      refStep = refStep,
      refIsDecl = refIsDecl,
      refOrd = refOrd,
      refDt = refDt,
      capSlots = capSlots,
      tsIdx = evalSchema.fieldIndex(tsCol),
      tbIdx = tbIdx,
      tbAsc = tiebreaks.map(_._2).toArray,
      inLen = df.columns.length,
      withId = matchIdCol.isDefined,
      horizonMs = horizonMs)
    val keyIdxs = keyCols.map(evalSchema.fieldIndex).toArray
    val stateEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(scanStateSchema(steps.size, declares.map(_._2), capSlots))
    val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    val func = (rows: Iterator[Row],
                state: org.apache.spark.sql.streaming.GroupState[Row]) =>
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else runtime.run(rows, state)
    val wm = df.withWatermark(tsCol, delayThreshold)
    if (keyIdxs.isEmpty)
      // unkeyed: one global state partition (opt-in; bounded state)
      wm.groupByKey(_ => 0)(Encoders.scalaInt)
        .flatMapGroupsWithState[Row, Row](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (_: Int, rows: Iterator[Row], state: org.apache.spark.sql.streaming.GroupState[Row]) =>
            func(rows, state)
        }(stateEnc, outEnc)
    else {
      val keyEnc: org.apache.spark.sql.Encoder[Row] =
        Encoders.row(StructType(keyCols.map(evalSchema(_)).toArray))
      wm.groupByKey(r => Row.fromSeq(keyIdxs.toIndexedSeq.map(r.get)))(keyEnc)
        .flatMapGroupsWithState[Row, Row](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (_: Row, rows: Iterator[Row], state: org.apache.spark.sql.streaming.GroupState[Row]) =>
            func(rows, state)
        }(stateEnc, outEnc)
    }
  }

  /** Persisted per-key state of [[streamingRowWindowSession]]. */
  final case class RwsState(haveSess: Boolean, sessStart: Long,
                            prevTs: Long, lastMs: Long)

  /** Streaming counterpart of Kusto `row_window_session` (batch kernel:
    * [[graft.ops.Funnel.rowWindowSession]] — the q179 class). Each row
    * gets its session's START timestamp; a new session opens on the
    * first row, when the gap to the previous row exceeds `idleUs`, when
    * the distance to the CURRENT session's start exceeds `maxFirstUs`
    * (the moving-anchor rule that makes this genuinely sequential — no
    * gaps-and-islands window rewrite exists), or when the restart
    * predicate fires. The restart predicate and the micros timestamp
    * are precomputed as codegen'd cells before the keyed state op, the
    * batch lowering's discipline.
    *
    * Streaming trade (same as [[streamingScanStateful]]): rows order by
    * event time ASCENDING within each micro-batch, then by the optional
    * `tiebreaks` (column name, ascending) — residual same-timestamp
    * ties keep arrival order; per-key state is three longs + a flag,
    * evicted once the watermark passes lastEvent + horizonMs.
    * Batch/stream parity on in-watermark data is pinned by
    * StreamOpsSpec on a shared fixture with a session spanning two
    * micro-batches. Pinned edge rule kept: a null timestamp emits a
    * null session start and does not advance the session state. */
  def streamingRowWindowSession(df: DataFrame, keyCols: Seq[String], tsCol: String,
      delayThreshold: String, horizonMs: Long, maxFirstUs: Long, idleUs: Long,
      restart: Option[Column], outName: String,
      tiebreaks: Seq[(String, Boolean)] = Nil): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    require(horizonMs > 0, "horizonMs must be positive")
    require(keyCols.nonEmpty, "streaming sessionization needs a partition key")
    if (df.columns.contains(outName))
      throw new IllegalArgumentException(
        s"row_window_session output column '$outName' collides with an input column")
    val inCols = df.columns.toSeq
    val inLen = inCols.length
    val tsCell = unix_micros(col(tsCol).cast("timestamp")).as("__rws_ts")
    val rCell = coalesce(restart.getOrElse(lit(false)).cast("boolean"), lit(false)).as("__rws_r")
    val eval = df.withWatermark(tsCol, delayThreshold)
      .select(inCols.map(col) ++ Seq(tsCell, rCell): _*)
    val schema = eval.schema
    val tI = schema.fieldIndex("__rws_ts")
    val rI = schema.fieldIndex("__rws_r")
    val keyIdxs = keyCols.map(schema.fieldIndex).toArray
    val tbIdx = tiebreaks.map { case (nm, _) => schema.fieldIndex(nm) }.toArray
    val tbAsc = tiebreaks.map(_._2).toArray
    tiebreaks.foreach { case (nm, _) =>
      if (!tiebreakOrderable(schema(nm).dataType))
        throw new IllegalArgumentException(
          s"row_window_session tiebreak column '$nm' has unorderable type " +
          schema(nm).dataType.simpleString)
    }
    // (event time asc nulls-first, tiebreaks) — stable, so residual
    // ties keep arrival order
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val ta = if (a.isNullAt(tI)) Long.MinValue else a.getLong(tI)
        val tb = if (b.isNullAt(tI)) Long.MinValue else b.getLong(tI)
        var c = java.lang.Long.compare(ta, tb)
        var i = 0
        while (c == 0 && i < tbIdx.length) {
          val av = a.get(tbIdx(i)); val bv = b.get(tbIdx(i))
          c =
            if (av == null && bv == null) 0
            else if (av == null) { if (tbAsc(i)) -1 else 1 }
            else if (bv == null) { if (tbAsc(i)) 1 else -1 }
            else {
              val r = av.asInstanceOf[Comparable[Any]].compareTo(bv)
              if (tbAsc(i)) r else -r
            }
          i += 1
        }
        c
      }
    }
    val outSchema = StructType(
      df.schema.fields :+ StructField(outName, LongType, nullable = true))
    val keyEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(StructType(keyCols.map(schema(_)).toArray))
    implicit val stateEnc: org.apache.spark.sql.Encoder[RwsState] = Encoders.product[RwsState]
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    eval.groupByKey(r => Row.fromSeq(keyIdxs.toIndexedSeq.map(r.get)))(keyEnc)
      .flatMapGroupsWithState[RwsState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var haveSess = false; var sessStart = 0L; var prevTs = 0L
            var lastMs = Long.MinValue
            state.getOption.foreach { s =>
              haveSess = s.haveSess; sessStart = s.sessStart
              prevTs = s.prevTs; lastMs = s.lastMs
            }
            val out = Vector.newBuilder[Row]
            val sorted = rows.toVector.sorted(rowOrd)
            sorted.foreach { row =>
              val vals = new Array[Any](inLen + 1)
              var i = 0
              while (i < inLen) { vals(i) = row.get(i); i += 1 }
              if (row.isNullAt(tI)) vals(inLen) = null
              else {
                val t = row.getLong(tI)
                val r = row.getBoolean(rI)
                if (!haveSess || r || t - prevTs > idleUs || t - sessStart > maxFirstUs) {
                  sessStart = t; haveSess = true
                }
                prevTs = t
                vals(inLen) = sessStart
                val tMs = Math.floorDiv(t, 1000L)
                if (tMs > lastMs) lastMs = tMs
              }
              out += Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
            }
            state.update(RwsState(haveSess, sessStart, prevTs, lastMs))
            state.setTimeoutTimestamp(math.max(
              (if (lastMs == Long.MinValue) 0L else lastMs) + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .withColumn(outName, timestamp_micros(col(outName)))
  }

  /** Executor side of [[streamingScanStateful]]: ships the driver-bound
    * expressions, compiles them once per task (transient lazy vals), and
    * replays the batch transition kernel over one key's micro-batch.
    * State round-trips the store as a TYPED row (see
    * [[scanStateSchema]]), scala external form. */
  private final class ScanMachineRuntime(
      evalSchema: org.apache.spark.sql.types.StructType,
      condExprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      assignExprs: Array[Array[(Int, org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.types.DataType)]],
      defaultExprs: Array[(org.apache.spark.sql.catalyst.expressions.Expression,
        org.apache.spark.sql.types.DataType)],
      emitStep: Array[Boolean],
      declDts: Array[org.apache.spark.sql.types.DataType],
      refStep: Array[Int], refIsDecl: Array[Boolean],
      refOrd: Array[Int], refDt: Array[org.apache.spark.sql.types.DataType],
      capSlots: Array[Array[(Int, org.apache.spark.sql.types.DataType)]],
      tsIdx: Int, tbIdx: Array[Int], tbAsc: Array[Boolean],
      inLen: Int, withId: Boolean, horizonMs: Long) extends Serializable {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow,
      MutableProjection, Predicate => CPredicate}

    private val n = condExprs.size
    private val nDecl = declDts.length
    private val nRefs = refStep.length

    @transient private lazy val toInternal =
      CatalystTypeConverters.createToCatalystConverter(evalSchema)
    @transient private lazy val preds = condExprs.map(CPredicate.create).toArray
    @transient private lazy val assignProjs: Array[Array[MutableProjection]] =
      assignExprs.map(_.map { case (_, e, _) => MutableProjection.create(Seq(e)) })
    @transient private lazy val defaultProjs =
      defaultExprs.map { case (e, _) => MutableProjection.create(Seq(e)) }
    @transient private lazy val declToScala =
      declDts.map(CatalystTypeConverters.createToScalaConverter)
    @transient private lazy val declToCat =
      declDts.map(CatalystTypeConverters.createToCatalystConverter)

    // micro-batch ordering: event time ascending (nulls first — they
    // never advance the timeout clock), then the declared tiebreak
    // columns; residual ties keep arrival order (stable sort)
    @transient private lazy val rowOrd: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        val ta = if (a.isNullAt(tsIdx)) Long.MinValue
                 else a.getAs[java.sql.Timestamp](tsIdx).getTime
        val tb = if (b.isNullAt(tsIdx)) Long.MinValue
                 else b.getAs[java.sql.Timestamp](tsIdx).getTime
        var c = java.lang.Long.compare(ta, tb)
        var i = 0
        while (c == 0 && i < tbIdx.length) {
          val av = a.get(tbIdx(i)); val bv = b.get(tbIdx(i))
          c =
            if (av == null && bv == null) 0
            else if (av == null) { if (tbAsc(i)) -1 else 1 }
            else if (bv == null) { if (tbAsc(i)) 1 else -1 }
            else {
              val r = av.asInstanceOf[Comparable[Any]].compareTo(bv)
              if (tbAsc(i)) r else -r
            }
          i += 1
        }
        c
      }
    }

    @transient private lazy val capToScala: Array[Array[Any => Any]] =
      capSlots.map(_.map { case (_, dt) =>
        val c = CatalystTypeConverters.createToScalaConverter(dt); (v: Any) => c(v) })
    @transient private lazy val capToCat: Array[Array[Any => Any]] =
      capSlots.map(_.map { case (_, dt) =>
        val c = CatalystTypeConverters.createToCatalystConverter(dt); (v: Any) => c(v) })

    /** Sparse copy of the consuming row holding only step k's slots. */
    private def slimCapture(ir: InternalRow, k: Int): InternalRow = {
      val g = new GenericInternalRow(inLen)
      val slots = capSlots(k)
      var i = 0
      while (i < slots.length) {
        g.update(slots(i)._1, ir.get(slots(i)._1, slots(i)._2)); i += 1
      }
      g
    }

    def run(rows: Iterator[Row],
            state: org.apache.spark.sql.streaming.GroupState[Row]): Iterator[Row] = {
      // restore the typed-row persisted state (scala external form, see
      // scanStateSchema) into the kernel's catalyst-form working arrays
      val persisted = state.getOption
      val states = new Array[Array[Any]](n)
      val captures = new Array[InternalRow](n)
      var nextId = 1L
      var lastMs = persisted.map(_.getLong(2 * n + 1)).getOrElse(Long.MinValue)
      persisted.foreach { p =>
        nextId = p.getLong(2 * n)
        var k = 0
        while (k < n) {
          if (!p.isNullAt(2 * k)) {
            val sRow = p.getStruct(2 * k)
            val s = new Array[Any](nDecl + 1)
            var i = 0
            while (i < nDecl) {
              s(i) = declToCat(i)(if (sRow.isNullAt(i)) null else sRow.get(i)); i += 1
            }
            s(nDecl) = sRow.getLong(nDecl)
            states(k) = s
            // re-hydrate the slim capture: only step k's referenced slots
            val g = new GenericInternalRow(inLen)
            val slots = capSlots(k)
            val cRow = p.getStruct(2 * k + 1)
            i = 0
            while (i < slots.length) {
              g.update(slots(i)._1,
                capToCat(k)(i)(if (cRow.isNullAt(i)) null else cRow.get(i)))
              i += 1
            }
            captures(k) = g
          }
          k += 1
        }
      }
      val stateRow = new GenericInternalRow(math.max(nRefs, 1))
      val joined = new JoinedRow
      def fillStateRow(): Unit = {
        var i = 0
        while (i < nRefs) {
          val st = refStep(i)
          val v =
            if (states(st) == null) null
            else if (refIsDecl(i)) states(st)(refOrd(i))
            else captures(st).get(refOrd(i), refDt(i))
          stateRow.update(i, v)
          i += 1
        }
      }
      val out = Vector.newBuilder[Row]
      // (event time asc, tiebreaks) within the micro-batch — see rowOrd
      val sorted = rows.toVector.sorted(rowOrd)
      sorted.foreach { row =>
        if (!row.isNullAt(tsIdx)) {
          val t = row.getAs[Timestamp](tsIdx).getTime
          if (t > lastMs) lastMs = t
        }
        val ir = toInternal(row).asInstanceOf[InternalRow]
        fillStateRow() // the pre-consumption snapshot all PREDICATES see
        joined(ir, stateRow)
        var k = n - 1
        var seq: Array[Any] = null
        var consumedAt = -1
        var completing = false
        while (k >= 0 && consumedAt < 0) {
          if (preds(k).eval(joined)) {
            if (k > 0 && states(k - 1) != null) { // promote (move, replace)
              seq = states(k - 1); states(k - 1) = null
              captures(k - 1) = null
              states(k) = seq; captures(k) = slimCapture(ir, k)
              consumedAt = k; completing = k == n - 1
            } else if (states(k) != null) { // extend (greedy)
              seq = states(k); captures(k) = slimCapture(ir, k)
              consumedAt = k
            } else if (k == 0) { // new sequence at step 1
              seq = new Array[Any](nDecl + 1)
              var i = 0
              while (i < nDecl) { seq(i) = defaultProjs(i)(joined).get(0, declDts(i)); i += 1 }
              seq(nDecl) = nextId; nextId += 1L
              states(0) = seq; captures(0) = slimCapture(ir, 0)
              consumedAt = 0
            }
          }
          if (consumedAt < 0) k -= 1
        }
        if (consumedAt >= 0) {
          // assignments: POST-move state, PRE-commit declared values,
          // atomic commit — the batch machine's pinned rules
          val as = assignExprs(consumedAt)
          val ps = assignProjs(consumedAt)
          if (as.nonEmpty) {
            if (nRefs > 0) { fillStateRow(); joined(ir, stateRow) }
            val staged = new Array[Any](as.length)
            var j = 0
            while (j < as.length) { staged(j) = ps(j)(joined).get(0, as(j)._3); j += 1 }
            j = 0
            while (j < as.length) { seq(as(j)._1) = staged(j); j += 1 }
          }
          if (emitStep(consumedAt)) {
            val vals = new Array[Any](inLen + nDecl + (if (withId) 1 else 0))
            var i = 0
            while (i < inLen) { vals(i) = row.get(i); i += 1 }
            while (i < inLen + nDecl) { vals(i) = declToScala(i - inLen)(seq(i - inLen)); i += 1 }
            if (withId) vals(inLen + nDecl) = seq(nDecl)
            out += Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          }
          if (completing && n > 1) {
            states(consumedAt) = null; captures(consumedAt) = null
          }
        }
      }
      // persist the typed state row (scala external form); keep it
      // (nextId continuity within the watermark horizon) even when no
      // sequence is open
      val fields = new Array[Any](2 * n + 2)
      var k = 0
      while (k < n) {
        if (states(k) != null) {
          val s = new Array[Any](nDecl + 1)
          var i = 0
          while (i < nDecl) { s(i) = declToScala(i)(states(k)(i)); i += 1 }
          s(nDecl) = states(k)(nDecl)
          fields(2 * k) = Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(s))
          val slots = capSlots(k)
          val cv = new Array[Any](slots.length)
          i = 0
          while (i < slots.length) {
            cv(i) = capToScala(k)(i)(captures(k).get(slots(i)._1, slots(i)._2)); i += 1
          }
          fields(2 * k + 1) = Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(cv))
        }
        k += 1
      }
      fields(2 * n) = nextId
      fields(2 * n + 1) = lastMs
      state.update(Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(fields)))
      state.setTimeoutTimestamp(math.max(
        (if (lastMs == Long.MinValue) 0L else lastMs) + horizonMs,
        state.getCurrentWatermarkMs() + 1))
      out.result().iterator
    }
  }

  /** Persisted per-key state of [[streamingSequenceDetect]]: the
    * matched timestamp (epoch micros) per step, [[SdUnset]] where the
    * step hasn't matched; `done` once the key emitted its completion
    * (suppresses re-detection while the key's state lives); `lastMs`
    * drives eviction. Flat product encoder — no opaque binary. */
  final case class SeqDetectState(ts: Array[Long], done: Boolean, lastMs: Long)
  private val SdUnset = Long.MinValue

  /** Streaming counterpart of Kusto `evaluate sequence_detect`
    * ([[graft.ops.Funnel.sequenceDetect]], the q120 class): per key,
    * the greedy earliest completion of the step sequence — each
    * consecutive step strictly later than the previous matched step and
    * within `stepWindowUs` of it, the whole sequence within
    * `totalGapUs` of step 1 — emitted as ONE row (key + one timestamp
    * column per step, batch's exact output shape) the moment the last
    * step matches. The sequential kernel IS the batch chained-window-
    * minima semantics replayed in event-time order: the earliest step-1
    * anchor, then the earliest in-budget match per subsequent step.
    *
    * Streaming trades (documented): rows order by event time within
    * each micro-batch (strict `>` between steps makes same-timestamp
    * rows unable to chain, mirroring batch); a key that completed stays
    * `done` — no re-detection — while its state lives, and state is
    * evicted `horizonMs` of event time after the key's last event
    * (event-time timeout), after which a NEW sequence may match — the
    * same in-horizon-parity contract as every keyed runner here. State
    * per key is `steps.length` longs + a flag, fixed-size forever. */
  def streamingSequenceDetect(df: DataFrame, keyName: String, tsName: String,
      delayThreshold: String, horizonMs: Long,
      steps: Seq[(String, Column)], stepWindowUs: Long, totalGapUs: Long): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    require(steps.nonEmpty, "sequence_detect needs at least one step")
    require(stepWindowUs > 0 && totalGapUs > 0, "sequence_detect windows must be positive")
    require(horizonMs > 0, "horizonMs must be positive")
    if (df.schema(tsName).dataType != TimestampType)
      throw new IllegalArgumentException(
        s"sequence_detect timeline '$tsName' must be a datetime " +
        s"(got ${df.schema(tsName).dataType.simpleString})")
    val n = steps.length
    // the batch lowering's discipline: timeline micros and the step
    // booleans are codegen'd CELLS before the keyed state op. The
    // watermarked timestamp column itself stays in the projection —
    // event-time timeouts need the tagged attribute in the child plan.
    val eval = df.withWatermark(tsName, delayThreshold)
      .select(col(keyName).as("__sd_k") +:
        col(tsName).as("__sd_t") +:
        unix_micros(col(tsName)).as("__sd_ts") +:
        steps.map { case (nm, c) => c.cast("boolean").as("__sd_p_" + nm) }: _*)
    val keyDt = df.schema(keyName).dataType
    val outSchema = StructType(
      StructField(keyName, keyDt, nullable = true) +:
      steps.map { case (nm, _) => StructField(nm, TimestampType, nullable = true) })
    val keyEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(StructType(Seq(StructField("__sd_k", keyDt, nullable = true))))
    implicit val stateEnc: org.apache.spark.sql.Encoder[SeqDetectState] =
      Encoders.product[SeqDetectState]
    implicit val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    eval.groupByKey(r => Row(r.get(0)))(keyEnc)
      .flatMapGroupsWithState[SeqDetectState, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (keyRow, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(
              SeqDetectState(Array.fill(n)(SdUnset), done = false, Long.MinValue))
            val tsArr = st.ts.clone()
            var done = st.done
            var lastMs = st.lastMs
            val out = Vector.newBuilder[Row]
            // null timelines never match a step in batch (min over a
            // null cell) and never advance the clock — skip them
            val sorted = rows.filter(!_.isNullAt(2)).toVector.sortBy(_.getLong(2))
            sorted.foreach { row =>
              val t = row.getLong(2)
              val tMs = Math.floorDiv(t, 1000L)
              if (tMs > lastMs) lastMs = tMs
              if (!done) {
                def p(i: Int): Boolean = !row.isNullAt(3 + i) && row.getBoolean(3 + i)
                var i = n - 1
                while (i >= 1 && !done) {
                  if (tsArr(i) == SdUnset && tsArr(i - 1) != SdUnset && p(i) &&
                      t > tsArr(i - 1) && t <= tsArr(i - 1) + stepWindowUs &&
                      t <= tsArr(0) + totalGapUs) {
                    tsArr(i) = t
                    if (i == n - 1) done = true
                  }
                  i -= 1
                }
                if (!done && tsArr(0) == SdUnset && p(0)) {
                  tsArr(0) = t
                  if (n == 1) done = true
                }
                if (done) out += Row.fromSeq(
                  keyRow.get(0) +: tsArr.toIndexedSeq.map(us =>
                    DateTimeUtils.toJavaTimestamp(us)))
              }
            }
            state.update(SeqDetectState(tsArr, done, lastMs))
            state.setTimeoutTimestamp(math.max(
              (if (lastMs == Long.MinValue) 0L else lastMs) + horizonMs,
              state.getCurrentWatermarkMs() + 1))
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
