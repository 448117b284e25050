package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Each operator exists in BOTH forms where meaningful:
  *  - batch (DataFrame over the parquet table) — oracle-verifiable
  *  - Structured Streaming (readStream → watermark → stateful op) —
  *    the scale path for continuous ingestion.
  * The streaming aggregations are keyed exactly like their batch
  * twins, so correctness of the streaming path is asserted against
  * the batch result in tests (same input, same output).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           sum_value: Double)

  /** Open-session state for the streaming sessionizer. Timestamps are
    * kept whole (not epoch millis): the batch twin emits min/max ts at
    * full parquet precision, and a session-for-session comparison
    * would otherwise lose the sub-millisecond digits.
    */
  final case class OpenSession(start: java.sql.Timestamp,
                               end: java.sql.Timestamp, n: Long, sum: Double)

  /** Tumbling (or sliding, when `slide` differs) event-time window
    * aggregation. Streaming form: add a watermark upstream; this is
    * the classic `groupBy(window(...))` incremental aggregation.
    */
  def windowedAgg(events: DataFrame, windowLen: String,
                  slide: Option[String] = None): DataFrame =
    events.groupBy(
        window(col("ts"), windowLen, slide.getOrElse(windowLen)).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_v"))

  /** Streaming twin of [[windowedAgg]] with an event-time watermark
    * bounding state.
    */
  def streamingWindowedAgg(events: DataFrame, windowLen: String,
                           watermark: String): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), windowLen)

  /** Batch gap-based sessionization: a new session starts when the
    * gap to the previous event of the same user exceeds `gapSeconds`.
    * Two shuffle-free passes over a single user-keyed sort: lag +
    * running sum of session-break flags — the standard windowed
    * formulation, SQL-expressible for the DuckDB oracle.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withBreaks = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBreaks.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming exact dedup: first event per `keys` wins, late
    * duplicates beyond the watermark are dropped along with their
    * state (dropDuplicatesWithinWatermark bounds state by event
    * time — the streaming twin of Dedup.exactDedup, where "first" is
    * arrival order rather than an explicit sort).
    */
  def streamingExactDedup(events: DataFrame, watermark: String,
                          keys: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** EXACT active actors per tumbling window — the engagement monitor
    * twin of the HLL distinct monitor ([[graft.streaming.DocStreams
    * .distinctTermsWindowed]] trades exactness for m longs of state;
    * this one is exact because actor cardinality per window is
    * operationally small next to a vocabulary). One definition, both
    * modes: batch runs it as a plain dedup + count; streaming chains
    * TWO stateful operators (event-time dedup on (window, actor) →
    * windowed count), the Spark-4 multi-stateful shape, with the
    * watermark bounding both states. State is one row per distinct
    * (window, actor) inside the watermark horizon — exactly the
    * quantity being reported, never the raw event stream.
    */
  def activeActorsWindowed(events: DataFrame, actorCol: String,
                           windowLen: String,
                           watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    val keyed = src.select(window(col("ts"), windowLen).as("w"),
      col(actorCol).as("actor"))
    val deduped =
      if (watermark.isDefined) keyed.dropDuplicates(Seq("w", "actor"))
      else keyed.distinct()
    deduped.groupBy(col("w"))
      .agg(count(lit(1)).as("n_active"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("n_active"))
  }

  /** Per-window DDSketch counts ([[graft.operators.Quantiles]]) — the
    * sketch IS a windowed count aggregate over (window, geometric
    * bucket), so the streaming form is the classic incremental agg
    * with state bounded by windows × buckets (a few hundred rows per
    * window regardless of event volume), never a per-value buffer.
    * Quantile reads ([[graft.operators.Quantiles.ddQuantiles]]) run
    * on the emitted sketch rows and are therefore IDENTICAL between
    * the streamed and batch sketches — the stream≡batch argument is
    * count-aggregate associativity, the same as
    * [[streamingWindowedAgg]]'s.
    */
  def ddSketchWindowedBatch(events: DataFrame, gamma: Double,
                            windowLen: String): DataFrame =
    events.filter(col("value") > 0)
      .groupBy(window(col("ts"), windowLen).as("w"),
        graft.operators.Quantiles.ddBucket(col("value"), gamma).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("bucket"), col("cnt"))

  /** Streaming twin of [[ddSketchWindowedBatch]]: watermark bounds
    * which windows stay open; append mode emits each closed window's
    * final sketch rows exactly once.
    */
  def ddSketchWindowedStream(events: DataFrame, gamma: Double,
                             windowLen: String, watermark: String): DataFrame =
    ddSketchWindowedBatch(events.withWatermark("ts", watermark), gamma,
      windowLen)

  /** Streaming twin of Dedup.lineDedup's suppression stage: explode
    * each arriving document into (id, pos, line) rows and emit only
    * lines whose exact text has not been seen within the watermark —
    * "first" is arrival order, and line-dedup state is bounded by
    * event time exactly like [[streamingExactDedup]]'s. Blank lines
    * (length < minChars) are exempt and always pass. Downstream can
    * regroup surviving lines per doc in a foreachBatch sink; the
    * unbounded-corpus reassembly itself is a batch concern
    * (Dedup.lineDedup).
    */
  def streamingLineDedup(docs: DataFrame, watermark: String,
                         idCol: String, textCol: String, tsCol: String = "ts",
                         minChars: Int = 1): DataFrame = {
    val lines = docs.withWatermark(tsCol, watermark)
      .select(col(idCol).as("id"), col(tsCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val exempt = lines.filter(length(col("line")) < minChars)
    val deduped = lines.filter(length(col("line")) >= minChars)
      .dropDuplicatesWithinWatermark(Seq("line"))
    exempt.unionByName(deduped)
  }

  /** Batch form of the view→purchase attribution join: each purchase
    * matches the same user's views in the preceding `windowSeconds`.
    * An equi-join on user plus a time-band predicate — the exact
    * semantics the streaming twin below computes incrementally.
    */
  def attributionJoinBatch(views: DataFrame, purchases: DataFrame,
                           windowSeconds: Long): DataFrame =
    purchases.select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .join(views.select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts")),
        Seq("user_id"))
      .filter(col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"interval $windowSeconds seconds"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))

  /** Stream-stream interval join: two watermarked streams joined on
    * user with an event-time band. Watermarks + the time-range
    * predicate let Spark bound both join states (views older than the
    * band fall out of state; purchases emit once their band closes) —
    * the canonical streaming attribution shape. Output equality with
    * [[attributionJoinBatch]] on the same input is asserted in
    * StreamingSpec.
    */
  def attributionJoinStream(views: DataFrame, purchases: DataFrame,
                            windowSeconds: Long, watermark: String): DataFrame = {
    val v = views.select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      p("user_id") === v("user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"interval $windowSeconds seconds"))
      .select(p("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
  }

  final case class WindowTopK(window_start: java.sql.Timestamp, rank: Int,
                              event_type: String, n: Long)

  /** Streaming per-window top-k heavy hitters: which event types
    * dominate each tumbling window, emitted EXACTLY ONCE per window
    * when the watermark passes its end. One stateful operator
    * (Spark restricts chaining arbitrary stateful ops): events key
    * by window start, per-key state is the (event_type -> count)
    * map updated incrementally per micro-batch, and the event-time
    * timeout fires the ranked emission — no complete-mode sink, no
    * per-batch re-ranking.
    *
    * State per open window is one counter per distinct type — fine
    * for bounded vocabularies (event types, status codes, language
    * tags). For unbounded keys swap the map for a bounded
    * space-saving sketch; the emission contract stays the same.
    * Ties rank lexicographically (deterministic replay).
    */
  def topKPerWindowStream(events: Dataset[Event], windowSeconds: Long, k: Int,
                          watermark: String = "10 seconds"): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    val winMs = windowSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      // floorDiv, not /: long division truncates toward zero, which
      // would put pre-epoch events in the WRONG window (the batch
      // twin floors — asserted equal in StreamingSpec)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, winMs) * winMs)
      .flatMapGroupsWithState[Map[String, Long], WindowTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (winStart: Long, rows: Iterator[Event], state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.getOrElse(Map.empty[String, Long])
            state.remove()
            counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex.map {
              case ((t, n), i) =>
                WindowTopK(new java.sql.Timestamp(winStart), i + 1, t, n)
            }.iterator
          } else {
            val counts = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
              (m, e) => m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
            }
            state.update(counts)
            state.setTimeoutTimestamp(winStart + winMs)
            Iterator.empty
          }
      }
  }

  /** Batch twin of [[topKPerWindowStream]] — the reference semantics
    * the streaming path is tested against.
    */
  def topKPerWindowBatch(events: DataFrame, windowSeconds: Long, k: Int): DataFrame = {
    val winMs = windowSeconds * 1000L
    val counts = events
      .groupBy((floor(unix_millis(col("ts")) / winMs) * winMs).as("win_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win_ms")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(timestamp_millis(col("win_ms").cast("long")).as("window_start"),
        col("rank"), col("event_type"), col("n"))
  }

  /** Streaming sessionization via flatMapGroupsWithState: state per
    * user is the open session; events beyond the gap close it and
    * emit. The custom-state counterpart of [[sessionizeBatch]]
    * (SURVEY.md §7.6), and SEMANTICALLY ALIGNED with it: the gap test
    * compares SECOND-truncated timestamps (the batch twin's
    * `unix_timestamp` diff — sub-second event times would otherwise
    * split sessions the oracle-checked definition keeps together),
    * session bounds fold as min/max of whole timestamps (full parquet
    * precision, order-robust within a merged session), and in-batch
    * processing order is the batch twin's (ts at full precision, ties
    * to event_id). With chronologically arriving batches the emitted
    * sessions are session-for-session the batch result minus each
    * user's final (still-open) session — the StreamingSpec claim.
    */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    def secs(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
    def le(a: java.sql.Timestamp, b: java.sql.Timestamp): Boolean =
      a.getTime < b.getTime || (a.getTime == b.getTime && a.getNanos <= b.getNanos)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[OpenSession], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[OpenSession]]) =>
          val sorted = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var sessions = state.getOption.getOrElse(Nil)
          val closed = List.newBuilder[Session]
          sorted.foreach { e =>
            sessions match {
              case open :: rest if secs(e.ts) - secs(open.end) <= gapSeconds =>
                sessions = open.copy(
                  start = if (le(open.start, e.ts)) open.start else e.ts,
                  end = if (le(e.ts, open.end)) open.end else e.ts,
                  n = open.n + 1, sum = open.sum + e.value) :: rest
              case open :: rest =>
                closed += Session(userId, open.start, open.end, open.n, open.sum)
                sessions = OpenSession(e.ts, e.ts, 1, e.value) :: rest
              case Nil =>
                sessions = OpenSession(e.ts, e.ts, 1, e.value) :: Nil
            }
          }
          state.update(sessions)
          closed.result().iterator
      }
  }

  /** Per-session funnel verdict emitted when a session closes. */
  final case class FunnelVerdict(user_id: Long, session_id: Long,
                                 converted: Boolean)

  /** Open funnel-session state: the running session counter, the
    * session's last event time (whole timestamp — gap tests truncate
    * to seconds like the batch twin, bounds keep full precision),
    * and the conversion extremes folded so far.
    */
  final case class OpenFunnel(seq: Long, end: java.sql.Timestamp,
                              firstStart: Option[java.sql.Timestamp],
                              lastEnd: Option[java.sql.Timestamp])

  /** Batch funnel: sessionize (the [[sessionizeBatch]] gap
    * definition), then per session fold the earliest `startType` and
    * latest `endType` timestamps; sessions containing a start convert
    * iff the last end is at-or-after the first start. One definition,
    * both modes — the oracle-checked `events_funnel` row is this plus
    * a count by verdict, and [[funnelStream]] emits the same
    * per-session verdicts from per-actor ordered-step state.
    */
  def funnelBatch(events: DataFrame, gapSeconds: Long,
                  startType: String = "click",
                  endType: String = "purchase"): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(when(col("event_type") === startType, col("ts"))).as("first_start"),
        max(when(col("event_type") === endType, col("ts"))).as("last_end"))
      .filter(col("first_start").isNotNull)
      .select(col("user_id"), col("session_id"),
        (col("last_end").isNotNull &&
          col("last_end") >= col("first_start")).as("converted"))
  }

  /** Streaming twin of [[funnelBatch]]: per-actor ordered-step state
    * (the [[sessionizeStream]] mold) — the open session carries only
    * its counter, last event time, and the two conversion extremes,
    * never the events. A verdict is emitted when a later event
    * closes the session; sessions without a `startType` event close
    * silently (the batch filter), and each actor's final still-open
    * session stays in state — with chronologically arriving batches
    * the emitted verdicts are the batch result minus those, the
    * StreamingSpec claim.
    */
  def funnelStream(events: Dataset[Event], gapSeconds: Long,
                   startType: String = "click",
                   endType: String = "purchase"): Dataset[FunnelVerdict] = {
    import events.sparkSession.implicits._
    def secs(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)
    def le(a: java.sql.Timestamp, b: java.sql.Timestamp): Boolean =
      a.getTime < b.getTime || (a.getTime == b.getTime && a.getNanos <= b.getNanos)
    def opened(seq: Long, e: Event): OpenFunnel = OpenFunnel(seq, e.ts,
      if (e.event_type == startType) Some(e.ts) else None,
      if (e.event_type == endType) Some(e.ts) else None)
    def absorb(o: OpenFunnel, e: Event): OpenFunnel = OpenFunnel(o.seq,
      if (le(e.ts, o.end)) o.end else e.ts,
      if (e.event_type == startType)
        Some(o.firstStart.filter(c => le(c, e.ts)).getOrElse(e.ts))
      else o.firstStart,
      if (e.event_type == endType)
        Some(o.lastEnd.filter(p => le(e.ts, p)).getOrElse(e.ts))
      else o.lastEnd)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenFunnel, FunnelVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenFunnel]) =>
          val sorted = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var open = state.getOption
          val out = List.newBuilder[FunnelVerdict]
          def close(o: OpenFunnel): Unit =
            o.firstStart.foreach(fs => out += FunnelVerdict(userId, o.seq,
              o.lastEnd.exists(pe => le(fs, pe))))
          sorted.foreach { e =>
            open = open match {
              case Some(o) if secs(e.ts) - secs(o.end) <= gapSeconds =>
                Some(absorb(o, e))
              case Some(o) =>
                close(o); Some(opened(o.seq + 1, e))
              case None => Some(opened(1L, e))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  final case class Attribution(conv_id: Long, actor: Long,
                               first_touch_id: Option[Long],
                               first_touch_type: Option[String],
                               last_touch_id: Option[Long],
                               last_touch_type: Option[String])

  /** Per-actor attribution state: the touches inside ONE lookback
    * window (us, event_id, type) — pruned against the newest event
    * time on every arrival, so state is bounded by an actor's touch
    * rate x the window, never by stream length.
    */
  final case class TouchWindow(touches: List[(Long, Long, String)])

  /** Streaming twin of [[graft.operators.Temporal
    * .attributionFirstLast]]: per-actor state holds the lookback
    * window's touches; each CONVERSION emits its first/last-touch
    * credit the moment it is processed — identical to the batch
    * RANGE-frame answer when events arrive in event-time order
    * (micro-batches are sorted internally; cross-batch reordering
    * needs the watermark buffer the other twins also presuppose).
    * Ties break by (us, event_id) exactly like the batch operator.
    */
  def attributionStream(events: Dataset[Event], convType: String,
                        touchTypes: Set[String],
                        windowSeconds: Long): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    val winUs = windowSeconds * 1000000L
    def us(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchWindow, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[TouchWindow]) =>
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var buf = state.getOption.map(_.touches).getOrElse(Nil)
          val out = List.newBuilder[Attribution]
          sorted.foreach { e =>
            val eus = us(e.ts)
            buf = buf.filter(_._1 >= eus - winUs)
            if (touchTypes(e.event_type))
              buf = buf :+ ((eus, e.event_id, e.event_type))
            else if (e.event_type == convType) {
              val valid = buf.filter(t => t._1 <= eus)
              val first = valid.minByOption(t => (t._1, t._2))
              val last = valid.maxByOption(t => (t._1, t._2))
              out += Attribution(e.event_id, userId,
                first.map(_._2), first.map(_._3),
                last.map(_._2), last.map(_._3))
            }
          }
          state.update(TouchWindow(buf))
          out.result().iterator
      }
  }

  /** One distinct (actor, period) activity fact, tagged with the
    * actor's cohort (their first-seen period).
    */
  final case class CohortFact(actor: Long, cohort: Long, period: Long)

  /** Per-actor cohort state: the cohort period plus every period
    * already emitted — bounded by periods-per-actor (days/weeks of
    * the retention window), never by events.
    */
  final case class ActorPeriods(cohort: Long, seen: List[Long])

  /** Streaming half of cohort retention: per-actor state emits one
    * [[CohortFact]] the FIRST time the actor is active in a period —
    * the incremental heavy lift (event-stream → distinct
    * (actor, period) facts) that [[graft.operators.Temporal
    * .cohortRetention]]'s `distinct()` does as a corpus-wide shuffle
    * per run. With chronologically arriving batches the actor's first
    * event fixes their cohort, exactly the batch `min(period)`.
    * The finishing table ([[cohortRetentionFromFacts]]) is a
    * bounded-cardinality aggregation over cohort×offset — recompute
    * it per tick in the sink; the facts stream is what must never be
    * recomputed from raw events.
    */
  def cohortFactsStream(events: Dataset[Event],
                        periodSeconds: Long): Dataset[CohortFact] = {
    import events.sparkSession.implicits._
    require(periodSeconds > 0, "periodSeconds must be positive")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ActorPeriods, CohortFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (actor: Long, rows: Iterator[Event], state: GroupState[ActorPeriods]) =>
          val periods = rows
            .map(e => Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L),
              periodSeconds))
            .toSeq.distinct.sorted
          var st = state.getOption.getOrElse(
            ActorPeriods(periods.head, Nil))
          val fresh = periods.filterNot(st.seen.contains)
          st = st.copy(seen = st.seen ++ fresh)
          state.update(st)
          fresh.iterator.map(p => CohortFact(actor, st.cohort, p))
      }
  }

  /** One closed gap-session's journey: the first-8-steps event-type
    * path plus whether the session converted anywhere along it.
    */
  final case class PathFact(user_id: Long, path: String, converted: Boolean)

  /** Open session-path state: last event time (micros), the first
    * `maxSteps` event types, and the conversion flag — bounded by
    * maxSteps, never by session length.
    */
  final case class OpenPath(endUs: Long, types: List[String],
                            converted: Boolean)

  /** Streaming twin of the batch `events_top_paths` sessionizer:
    * per-actor state carries ONE open session (micros-precision gap,
    * exactly the batch lag test); a later event past the gap closes
    * it and emits its [[PathFact]]. The path keeps the first
    * `maxSteps` types in (us, event_id) order — the batch
    * slice(array_sort(...), 1, 8) — while the conversion flag folds
    * over the WHOLE session. Each actor's final still-open session
    * stays in state; with chronological batches the emitted facts are
    * the batch session table minus those (the StreamingSpec claim).
    * The finishing histogram is [[topPathsFromFacts]], recomputed per
    * tick in the sink over the bounded distinct-path table.
    */
  def pathFactsStream(events: Dataset[Event], gapSeconds: Long,
                      convType: String = "purchase",
                      maxSteps: Int = 8): Dataset[PathFact] = {
    import events.sparkSession.implicits._
    require(gapSeconds > 0 && maxSteps > 0, "bad path-session params")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenPath, PathFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenPath]) =>
          def us(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          val gapUs = gapSeconds * 1000000L
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var open = state.getOption
          val out = List.newBuilder[PathFact]
          sorted.foreach { e =>
            val eus = us(e.ts)
            open match {
              case Some(o) if eus - o.endUs <= gapUs =>
                open = Some(OpenPath(eus,
                  if (o.types.size < maxSteps) o.types :+ e.event_type
                  else o.types,
                  o.converted || e.event_type == convType))
              case Some(o) =>
                out += PathFact(userId, o.types.mkString(">"), o.converted)
                open = Some(OpenPath(eus, List(e.event_type),
                  e.event_type == convType))
              case None =>
                open = Some(OpenPath(eus, List(e.event_type),
                  e.event_type == convType))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Finishing aggregation over [[pathFactsStream]] facts: the
    * top-paths conversion histogram, column-for-column the batch
    * `events_top_paths` result shape.
    */
  def topPathsFromFacts(facts: DataFrame, limit: Int = 50): DataFrame =
    facts.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("path"), col("n_sessions"), col("n_converted"),
        expr("n_converted * 1000000 div n_sessions").as("conv_micro"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(limit)

  /** Per-actor EWMA snapshot emitted after each micro-batch that
    * touched the actor: the running recursive fold's current value.
    */
  final case class EwmaSnapshot(user_id: Long, n_events: Long,
                                ewma_value: Double)

  /** Streaming twin of the batch `events_ewma` recursive fold — the
    * one aggregation family NO SQL window expresses (each step
    * multiplies the previous result), which makes it the family that
    * benefits MOST from streaming state: the batch form must re-fold
    * every actor's full history per run, while the state carries just
    * (n, current ewma) and folds only the batch's arrivals.
    *
    * Exact equality, not approximate: both modes fold the identical
    * op sequence (acc·(1−α) + v·α in (ts, event_id) order — batches
    * arriving chronologically concatenate to the batch sort), so the
    * IEEE doubles are bit-equal, the same argument the DuckDB oracle
    * for `events_ewma` rests on. Emits one snapshot per touched actor
    * per micro-batch; the latest snapshot is the batch answer.
    */
  def ewmaStream(events: Dataset[Event], alpha: Double = 0.5)
      : Dataset[EwmaSnapshot] = {
    import events.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaSnapshot, EwmaSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[EwmaSnapshot]) =>
          def us(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var st = state.getOption.getOrElse(
            EwmaSnapshot(userId, 0L, Double.NaN))
          sorted.foreach { e =>
            val v =
              if (st.n_events == 0L) e.value
              else st.ewma_value * (1.0 - alpha) + e.value * alpha
            st = EwmaSnapshot(userId, st.n_events + 1L, v)
          }
          state.update(st)
          Iterator.single(st)
      }
  }

  /** One first-order Markov transition observed for an actor: the
    * (previous event type → this event type) edge in time order.
    */
  final case class TransitionFact(user_id: Long, prev_type: String,
                                  event_type: String)

  /** Per-actor last-event marker — the ONLY state the streaming
    * transition counter needs: O(1) per actor, independent of
    * history length.
    */
  final case class LastEvent(tsUs: Long, eventId: Long, eventType: String)

  /** Streaming twin of the batch `events_transitions` lag-window:
    * per-actor state carries just the LAST event; each micro-batch
    * sorts its per-actor slice by (ts, event_id) — the batch twin's
    * exact lag order — and emits one [[TransitionFact]] per
    * consecutive pair, including the pair that SPANS the batch
    * boundary (the edge a per-batch window recomputation would
    * either miss or double-count). Chronological micro-batch arrival
    * is assumed, like [[cohortFactsStream]]; the finishing
    * aggregation ([[transitionsFromFacts]]) is a bounded
    * type×type matrix recomputed per tick in the sink.
    */
  def transitionFactsStream(events: Dataset[Event]): Dataset[TransitionFact] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionFact](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LastEvent]) =>
          def us(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          val out = List.newBuilder[TransitionFact]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += TransitionFact(userId, p.eventType,
              e.event_type))
            prev = Some(LastEvent(us(e.ts), e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Finishing aggregation over [[transitionFactsStream]] facts:
    * the first-order Markov matrix, column-for-column the batch
    * `events_transitions` result.
    */
  def transitionsFromFacts(facts: DataFrame): DataFrame =
    facts.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("event_type"))

  /** One normalized engagement fact from the composed live pipeline:
    * the tagged union the six twins' outputs flatten into so they can
    * ride ONE streaming query. `k`/`v` carry each kind's payload in a
    * deterministic string encoding (doubles as raw IEEE bits, so the
    * encoding never rounds): funnel (k=session, v=converted),
    * attribution (k=conv id, v="fid:ftype>lid:ltype" with -1/"" for
    * uncredited), cohort (k=cohort period, v=active period), path
    * (k=path, v=converted), ewma (k=n_events, v=rawLongBits(value)),
    * transition (k=prev type, v=type).
    */
  final case class EngagementFact(kind: String, user_id: Long,
                                  k: String, v: String)

  private def encodeAttr(a: Attribution): EngagementFact =
    EngagementFact("attribution", a.actor, a.conv_id.toString,
      s"${a.first_touch_id.getOrElse(-1L)}:${a.first_touch_type.getOrElse("")}" +
        s">${a.last_touch_id.getOrElse(-1L)}:${a.last_touch_type.getOrElse("")}")

  /** THE COMPOSED LIVE PIPELINE (round-13): admitted docs' events
    * through ALL SIX engagement twins — funnel, attribution, cohort
    * retention facts, session paths, EWMA, Markov transitions — in
    * ONE streaming query, the way the four-gate ingest composes its
    * batch gates in one plan. Spark 4's multi-stateful-operator
    * support lets the six flatMapGroupsWithState branches run as
    * parallel legs of a single union: one source scan, one
    * checkpoint, one sink, state co-partitioned per actor.
    *
    * `admittedActors` is the admission output of the ingest gates
    * (one id column) — STATIC relative to the stream, so the
    * admission filter is a broadcastable stream-static semi-join
    * ahead of every stateful leg: rejected actors' events never
    * enter any state store.
    *
    * Scale shape: all six legs key state by the SAME actor column,
    * so the plan pays ONE shuffle per leg over admitted events only;
    * per-actor state stays the per-twin bounded state documented on
    * each twin. StreamingSpec proves the composition end-to-end
    * against [[engagementFactsBatch]].
    */
  def engagementFactsStream(events: Dataset[Event],
                            admittedActors: DataFrame, actorIdCol: String,
                            gapSeconds: Long = 1800L,
                            startType: String = "click",
                            convType: String = "purchase",
                            touchTypes: Set[String] = Set("click", "view", "signup"),
                            lookbackSeconds: Long = 86400L,
                            periodSeconds: Long = 86400L,
                            alpha: Double = 0.5): Dataset[EngagementFact] = {
    val spark = events.sparkSession
    import spark.implicits._
    val admitted = events
      .join(broadcast(admittedActors
        .select(col(actorIdCol).cast("long").as("user_id")).distinct()),
        Seq("user_id"), "left_semi")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event]
    val funnel = funnelStream(admitted, gapSeconds, startType, convType)
      .map(f => EngagementFact("funnel", f.user_id, f.session_id.toString,
        f.converted.toString))
    val attr = attributionStream(admitted, convType, touchTypes,
      lookbackSeconds).map(encodeAttr)
    val cohort = cohortFactsStream(admitted, periodSeconds)
      .map(c => EngagementFact("cohort", c.actor, c.cohort.toString,
        c.period.toString))
    val paths = pathFactsStream(admitted, gapSeconds, convType)
      .map(p => EngagementFact("path", p.user_id, p.path, p.converted.toString))
    val ewma = ewmaStream(admitted, alpha)
      .map(s => EngagementFact("ewma", s.user_id, s.n_events.toString,
        java.lang.Double.doubleToRawLongBits(s.ewma_value).toString))
    val trans = transitionFactsStream(admitted)
      .map(t => EngagementFact("transition", t.user_id, t.prev_type,
        t.event_type))
    funnel.union(attr).union(cohort).union(paths).union(ewma).union(trans)
  }

  /** Batch twin of [[engagementFactsStream]], composed from the
    * INDEPENDENT batch operators (lag/RANGE windows and HOF folds —
    * not the streaming fold code), so the stream≡batch comparison in
    * StreamingSpec is a genuine cross-implementation check:
    * [[funnelBatch]], [[graft.operators.Temporal
    * .attributionFirstLast]], the distinct-(actor, period) cohort
    * derivation, the `events_top_paths` session-path window, the
    * `events_ewma` aggregate() fold, and the `events_transitions`
    * lag pairs.
    *
    * Batch semantics close EVERY session; `excludeOpenTail = true`
    * drops each actor's LAST session's funnel and path facts — what
    * a stream has necessarily not yet emitted at end-of-input — so
    * the spec compares equal sets. EWMA emits one final snapshot per
    * actor (the stream's LATEST snapshot).
    */
  def engagementFactsBatch(events: DataFrame, admittedActors: DataFrame,
                           actorIdCol: String,
                           gapSeconds: Long = 1800L,
                           startType: String = "click",
                           convType: String = "purchase",
                           touchTypes: Set[String] = Set("click", "view", "signup"),
                           lookbackSeconds: Long = 86400L,
                           periodSeconds: Long = 86400L,
                           alpha: Double = 0.5,
                           excludeOpenTail: Boolean = false,
                           ewmaEncoding: String = "bits"): Dataset[EngagementFact] = {
    require(ewmaEncoding == "bits" || ewmaEncoding == "micro",
      s"engagementFactsBatch: ewmaEncoding '$ewmaEncoding' (bits|micro) — " +
        "bits is the lossless raw-IEEE form the stream comparison uses; " +
        "micro (floor(v*10^6)) is the oracle-portable form")
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .join(broadcast(admittedActors
        .select(col(actorIdCol).cast("long").as("user_id")).distinct()),
        Seq("user_id"), "left_semi")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .cache()
    // each session kind excludes its open tail under ITS OWN session
    // numbering: funnel sessions break on the SECONDS gap
    // (sessionizeBatch ≡ funnelStream's floorDiv(ms, 1000) test),
    // path sessions on the MICROS gap — an event pair straddling the
    // second boundary (e.g. 1800.5 s apart at gap 1800) splits one
    // numbering but not the other, so sharing one last-sid table
    // would drop the wrong session
    val lastFunnelSid = sessionizeBatch(ev, gapSeconds)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("__last_sid"))
    def dropTail(df: DataFrame, sidCol: String,
                 lastSid: DataFrame): DataFrame =
      if (!excludeOpenTail) df
      else df.join(lastSid, Seq("user_id"))
        .filter(col(sidCol) =!= col("__last_sid")).drop("__last_sid")
    val funnel = dropTail(funnelBatch(ev, gapSeconds, startType, convType),
        "session_id", lastFunnelSid)
      .select(lit("funnel").as("kind"), col("user_id"),
        col("session_id").cast("string").as("k"),
        col("converted").cast("string").as("v"))
    val attr = graft.operators.Temporal.attributionFirstLast(ev, "user_id",
        "ts", "event_type", "event_id", convType, touchTypes.toSeq.sorted,
        lookbackSeconds)
      .as[(Long, Long, Option[Long], Option[String], Option[Long], Option[String])]
      .map { case (cid, actor, fid, ftp, lid, ltp) =>
        encodeAttr(Attribution(cid, actor, fid, ftp, lid, ltp)) }
    val cohort = ev
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / lit(periodSeconds)).cast("long")
          .as("period"))
      .distinct()
      .withColumn("cohort", min(col("period")).over(
        Window.partitionBy(col("user_id"))))
      .select(lit("cohort").as("kind"), col("user_id"),
        col("cohort").cast("string").as("k"),
        col("period").cast("string").as("v"))
    // session paths: the events_top_paths window derivation kept at
    // per-session granularity (micros gap, first-8 types, whole-
    // session conversion fold)
    val us = unix_micros(col("ts"))
    val wu = Window.partitionBy(col("user_id")).orderBy(us, col("event_id"))
    val sess = ev
      .withColumn("__new",
        when(us - lag(us, 1).over(wu) > lit(gapSeconds * 1000000L) ||
          lag(us, 1).over(wu).isNull, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val lastPathSid = sess.groupBy(col("user_id"))
      .agg(max(col("__sid")).as("__last_sid"))
    val paths = dropTail(
      sess.groupBy(col("user_id"), col("__sid"))
        .agg(
          concat_ws(">", slice(transform(
            array_sort(collect_list(struct(us.as("us"),
              col("event_id").as("id"), col("event_type").as("tp")))),
            x => x.getField("tp")), 1, 8)).as("path"),
          max(when(col("event_type") === convType, 1L).otherwise(0L))
            .as("__conv")), "__sid", lastPathSid)
      .select(lit("path").as("kind"), col("user_id"), col("path").as("k"),
        (col("__conv") === 1L).cast("string").as("v"))
    val ewma = ev
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("evs"))
      .select(col("user_id"), size(col("evs")).cast("long").as("n"),
        aggregate(col("evs"), lit(Double.NaN),
          (acc, e) => when(isnan(acc), e.getField("value"))
            .otherwise(acc * lit(1.0 - alpha) + e.getField("value") * lit(alpha)))
          .as("val"))
      .as[(Long, Long, Double)]
      .map { case (u, n, v) => EngagementFact("ewma", u, n.toString,
        if (ewmaEncoding == "micro") math.floor(v * 1e6).toLong.toString
        else java.lang.Double.doubleToRawLongBits(v).toString) }
    val trans = ev
      .withColumn("__prev", lag(col("event_type"), 1).over(wu))
      .filter(col("__prev").isNotNull)
      .select(lit("transition").as("kind"), col("user_id"),
        col("__prev").as("k"), col("event_type").as("v"))
    // eager checkpoint (fact-set-sized) so the internal events cache
    // can be released deterministically — the editSimilarityJoin
    // cleanup discipline. EXECUTION CONTRACT: the composition runs at
    // CALL time and the returned Dataset is a materialized,
    // lineage-severed result in non-reliable executor storage (an
    // executor decommission under dynamic allocation loses it and it
    // cannot recompute — re-call); callers needing laziness or
    // reliable storage should persist the result themselves
    val out = funnel.as[EngagementFact]
      .union(attr)
      .union(cohort.as[EngagementFact])
      .union(paths.as[EngagementFact])
      .union(ewma)
      .union(trans.as[EngagementFact])
      .localCheckpoint()
    ev.unpersist(blocking = false)
    out
  }

  /** The batch-finishing aggregation over [[cohortFactsStream]]'s
    * facts: cohort sizes from the offset-0 facts (every actor emits
    * their cohort period first), per-(cohort, offset) counts (facts
    * are distinct by construction), and the exact integer
    * micro-fraction — column-for-column [[graft.operators.Temporal
    * .cohortRetention]].
    */
  def cohortRetentionFromFacts(facts: DataFrame): DataFrame =
    // join-free: the cohort size IS the offset-0 count (every actor's
    // first fact is their cohort period), read back via a window over
    // the already-aggregated cohort×offset table — which also keeps a
    // memory-sink facts table (whose leaf plan does not dedup
    // attributes on self-join) usable directly
    facts
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("n_cohort",
        max(when(col("offset") === 0, col("n_active")))
          .over(Window.partitionBy(col("cohort"))))
      .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
        expr("n_active * 1000000 div n_cohort").as("retention_micro"))
      .orderBy(col("cohort"), col("offset"))
}
