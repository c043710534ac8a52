package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Structured Streaming surface (builder brief: `readStream` →
  * transforms → `writeStream`, watermarks + windowed aggregations,
  * `mapGroupsWithState` for custom state). The reference is strictly
  * batch (SURVEY.md §2.2 "streaming: absent"), so this is
  * beyond-reference capability: the same engine shape pointed at a
  * stream of events.
  *
  * Scale notes: the file source discovers new files incrementally
  * (maxFilesPerTrigger governs batch sizing on a real bucket); the
  * windowed aggregation is stateful with watermark-bounded state, so
  * state size is (windows in flight × event types), not event volume.
  */
object StreamOps {

  /** Tumbling-window counts/sums over the events table consumed as a
    * bounded STREAM through the real streaming path (file source →
    * watermark → windowed agg → memory sink), returning the final
    * result — which must equal the batch answer, and is verified
    * against the DuckDB oracle exactly like any batch operator. */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("sv"))
    val name = s"graft_stream_${math.abs(sfDir.hashCode)}"
    withStatePartitions(spark) {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
  }

  /** The unbounded-safe sibling of [[windowedEventCounts]]: APPEND
    * output mode into a durable parquet FILE SINK with a checkpoint —
    * the shape a production pipeline runs, where state never reaches
    * the driver and each window is emitted exactly once, when the
    * watermark passes its end. On bounded input that means windows
    * with `end <= max(ts) - delay` (the final in-flight windows stay
    * in state by design — Structured Streaming's no-data micro-batch
    * emits the rest after the last file); the oracle applies the same
    * watermark rule, so the driver hash-compare pins the emission
    * semantics, not just the arithmetic. */
  def appendWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("sv"))
    val out = tempDir("graft-stream-out")
    val ckpt = tempDir("graft-stream-ckpt")
    withStatePartitions(spark) {
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(agg.schema)).parquet(out.toString)
  }

  /** STREAMING DEDUPLICATION — the streaming side of the dedup theme:
    * two identical file sources union into a stream where every event
    * arrives twice (the at-least-once delivery a real ingest bus
    * produces), and `dropDuplicatesWithinWatermark` on the unique key
    * restores exactly-once before a downstream windowed aggregation —
    * two CHAINED stateful operators in one append-mode query. Dedup
    * state is watermark-bounded (keys older than the delay are
    * dropped from state), so state size tracks the delay window, not
    * stream length — the only dedup shape that survives an unbounded
    * stream. On bounded input the result must equal the single-copy
    * batch answer under the s02 emission rule, which the oracle
    * recomputes. */
  def dedupWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    def src() = eventsStream(spark, sfDir)
    val deduped = src().union(src())
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val agg = deduped
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("sv"))
    val out = tempDir("graft-dedup-out")
    val ckpt = tempDir("graft-dedup-ckpt")
    // dedup keys within the watermark grow with event RATE — volume-scaled
    withStatePartitions(spark, volumeStatePartitions(spark, sfDir)) {
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(agg.schema)).parquet(out.toString)
  }

  /** STREAM-STREAM INTERVAL JOIN — the sessionization/attribution
    * primitive: two event streams joined on user with an event-time
    * range (`b.ts` within 10 minutes after `a.ts`). Both sides carry
    * watermarks and the join condition bounds event time, so each
    * side's buffered state is evicted once the watermark passes the
    * range — state tracks the interval width, not stream length.
    * Inner-join matches emit as soon as both rows arrive; on bounded
    * input the result equals the batch join exactly, which is what
    * the oracle computes. */
  def intervalJoinPairs(spark: SparkSession, sfDir: String): DataFrame = {
    def src() = eventsStream(spark, sfDir)
    val a = src().withWatermark("ts", "1 hour").alias("a")
    val b = src().withWatermark("ts", "1 hour").alias("b")
    // note: StreamingJoinHelper logs a scary-but-benign
    // "[INTERNAL_ERROR] Cannot evaluate expression: event_id" WARN while
    // probing conjuncts for extra state bounds — the non-temporal
    // id-ordering predicate can't yield one (and spelling it as a
    // post-join filter doesn't help: PushPredicateThroughJoin merges it
    // right back). State eviction comes from the event-time range.
    val joined = a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 10 MINUTES") &&
          col("a.event_id") < col("b.event_id"))
      .select(col("a.event_id").as("ida"), col("b.event_id").as("idb"),
        col("a.user_id").as("user_id"),
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        (col("b.ts").cast("long") - col("a.ts").cast("long")).as("gap_s"))
    val out = tempDir("graft-sjoin-out")
    val ckpt = tempDir("graft-sjoin-ckpt")
    // inner-join matches emit on arrival — the trailing no-data
    // micro-batch exists only to evict state early, which a bounded
    // run doesn't need; skipping it saves a full state-store pass
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    spark.conf.set(noData, "false")
    try withStatePartitions(spark, volumeStatePartitions(spark, sfDir)) {
      val q = joined.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set(noData, prevNoData)
    spark.read.schema(org.apache.spark.sql.types.StructType(joined.schema)).parquet(out.toString)
  }

  /** LEFT-OUTER stream-stream join — the semantics inner joins don't
    * exercise: an unmatched left row may only emit (with right-side
    * NULLs) once the watermark proves no future right row can match,
    * so null emission is a STATE-EVICTION event, not an arrival
    * event. Left side: events with id ≡ 0 (mod 3); right side: same
    * user's id ≡ 1 (mod 3) events in [a.ts, a.ts + 10 min]. Matches
    * emit on arrival; unmatched lefts emit when the global watermark
    * (min of both sources' max ts − 1 h) passes their join-window
    * end. The bounded replay leaves lefts whose window is still open
    * unemitted — the oracle reproduces exactly that rule, so the hash
    * compare pins the eviction semantics. State is bounded by the
    * 10-minute range + 1-hour watermark on both sides, exactly as in
    * [[intervalJoinPairs]]. */
  def leftJoinAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    def src() = eventsStream(spark, sfDir)
    // filter BEFORE the watermark: each side's watermark tracks its
    // own subset's max event time, like two genuinely distinct topics
    val a = src().where("event_id % 3 = 0").withWatermark("ts", "1 hour").alias("a")
    val b = src().where("event_id % 3 = 1").withWatermark("ts", "1 hour").alias("b")
    val joined = a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 10 MINUTES"),
        "left_outer")
      .select(col("a.event_id").as("ida"), col("b.event_id").as("idb"),
        col("a.user_id").as("user_id"),
        (col("b.ts").cast("long") - col("a.ts").cast("long")).as("gap_s"))
    val out = tempDir("graft-sljoin-out")
    val ckpt = tempDir("graft-sljoin-ckpt")
    // unlike the inner join, the trailing no-data micro-batch is
    // REQUIRED here: it advances the final watermark so expired
    // unmatched lefts flush their null rows (leave the default on)
    withStatePartitions(spark, volumeStatePartitions(spark, sfDir, 1.0 / 3)) {
      val q = joined.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(joined.schema)).parquet(out.toString)
  }

  /** SESSION WINDOWS — the sessionization primitive itself (s04 is
    * the pairwise-attribution variant): per-user sessions close after
    * a 10-minute event-time silence, via `session_window` — dynamic-
    * length windows that MERGE as events arrive, the one windowed
    * shape tumbling/sliding windows cannot express. State is merged
    * sessions in flight, evicted once the watermark passes a
    * session's end (last event + gap), so state tracks concurrently
    * open sessions, not stream length. Append mode emits each closed
    * session exactly once; on bounded input that is every session
    * with end <= max(ts) − delay, which the oracle recomputes as a
    * batch gaps-and-islands pass. */
  def sessionWindowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sv"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sv"))
    val out = tempDir("graft-sess-out")
    val ckpt = tempDir("graft-sess-ckpt")
    withStatePartitions(spark) {
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(agg.schema)).parquet(out.toString)
  }

  /** SLIDING WINDOWS — the overlapping-window variant of s02: 1-hour
    * windows advancing every 30 minutes, so every event lands in
    * exactly two windows (window/slide = 2 — Spark expands the event
    * into its member windows BEFORE the stateful agg; state is
    * windows-in-flight × types, twice s02's). Append mode under the
    * same watermark emission rule; the oracle derives each event's
    * two member windows from epoch arithmetic and applies the same
    * rule, so the hash compare pins the window expansion AND the
    * emission semantics. */
  def slidingWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("c"), col("sv"))
    val out = tempDir("graft-slide-out")
    val ckpt = tempDir("graft-slide-ckpt")
    withStatePartitions(spark) {
      val q = agg.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(agg.schema)).parquet(out.toString)
  }

  /** STREAM-STATIC ENRICHMENT — the dimension-join shape every
    * production stream runs: the event stream joins a STATIC
    * dimension table (customer) that Spark plans as a broadcast hash
    * join inside every micro-batch — stateless, no watermark, no
    * state store; the stream side never shuffles. On bounded input
    * the result is exactly the batch join. */
  def enrichedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = eventsStream(spark, sfDir)
    val dim = broadcast(spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")))
    val joined = stream.join(dim, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"), col("value"))
    val out = tempDir("graft-enrich-out")
    val ckpt = tempDir("graft-enrich-ckpt")
    withStatePartitions(spark) {
      val q = joined.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(joined.schema)).parquet(out.toString)
  }

  /** FULL-OUTER stream-stream join — completes the join-mode matrix
    * (s04 inner, s08 left): BOTH sides' unmatched rows emit as
    * state-eviction events. The eviction bounds are asymmetric,
    * derived from the time-range condition: an unmatched LEFT row's
    * null result emits once the watermark passes its join-window end
    * (a.ts + 10 min), an unmatched RIGHT row's once the watermark
    * passes b.ts itself (a future left would need a.ts <= b.ts, and
    * future rows sit at or above the watermark). The oracle
    * reproduces both rules, so the hash compare pins the two-sided
    * eviction semantics. State bounds as in s04/s08. */
  def fullJoinAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    def src() = eventsStream(spark, sfDir)
    val a = src().where("event_id % 3 = 0").withWatermark("ts", "1 hour").alias("a")
    val b = src().where("event_id % 3 = 1").withWatermark("ts", "1 hour").alias("b")
    val joined = a.join(b,
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 10 MINUTES"),
        "full_outer")
      .select(col("a.event_id").as("ida"), col("b.event_id").as("idb"),
        coalesce(col("a.user_id"), col("b.user_id")).as("user_id"),
        (col("b.ts").cast("long") - col("a.ts").cast("long")).as("gap_s"))
    val out = tempDir("graft-sfjoin-out")
    val ckpt = tempDir("graft-sfjoin-ckpt")
    // the trailing no-data micro-batch advances the final watermark so
    // both sides' expired unmatched rows flush their null results
    withStatePartitions(spark, volumeStatePartitions(spark, sfDir, 1.0 / 3)) {
      val q = joined.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(joined.schema)).parquet(out.toString)
  }

  /** One session in flight for a user inside [[customStateSessions]]'
    * state: event-time bounds in epoch micros plus running count/sum. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sv: Double)

  /** One emitted (closed) session from [[customStateSessions]], micros
    * bounds; the caller converts to timestamps. */
  case class ClosedSession(start_us: Long, end_us: Long, user_id: Long,
      n_events: Long, sv: Double)

  /** CUSTOM-STATE SESSIONIZATION — s05's 10-minute-gap sessions
    * re-implemented on `flatMapGroupsWithState` + event-time timeout,
    * the arbitrary-state primitive for semantics no built-in stateful
    * operator expresses (the built-in `session_window` exists for THIS
    * semantics, which is exactly why it's the right harness: the
    * custom-state path is pinned against the same batch
    * gaps-and-islands oracle as s05, so the hash compare verifies the
    * hand-rolled merge, eviction and emission logic end to end).
    * Per user, state is the list of open sessions (merged on overlap
    * of [ts, ts+gap) intervals, exactly `session_window`'s rule); a
    * session emits once the watermark passes its end — inline when a
    * data batch observes it closed, else via the event-time timeout
    * set to the earliest open end, which fires on the watermark-only
    * batch after the bounded replay drains. Sessions still open at
    * the final watermark never emit, matching the s02/s05 append
    * rule. State per user is open sessions only — watermark-bounded,
    * not stream-length-bounded — and the shuffle is one exchange on
    * user_id into the state store.
    *
    * Timeout granularity: `GroupState` timeouts are millisecond-
    * resolution and fire strictly below the watermark, so the timeout
    * is set to ceil(endUs/1000)−1 clamped above the current watermark
    * — a session whose end lands inside the single millisecond at the
    * clamp boundary would emit one watermark-update late (never, on a
    * drained bounded replay). The engine's own ms-floored watermark
    * (shared with s05's session_window) makes the two paths
    * behaviorally identical at every boundary. */
  def customStateSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, sfDir)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val sessions = sessionize(ev)
    val out = tempDir("graft-fmgws-out")
    val ckpt = tempDir("graft-fmgws-ckpt")
    withStatePartitions(spark) {
      val q = sessions.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(sessions.schema))
      .parquet(out.toString)
      .select(timestamp_micros(col("start_us")).as("sess_start"),
        timestamp_micros(col("end_us")).as("sess_end"),
        col("user_id"), col("n_events"), round(col("sv"), 2).as("sv"))
  }

  /** [[customStateSessions]]' core, on any watermarked
    * (user_id, ts, ts_us, value) stream — factored out so the spec
    * drives it over a MemoryStream with controlled multi-batch,
    * out-of-order arrivals (which a single-file bounded replay
    * cannot exercise). Note the engine drops LATE input rows (event
    * time below the batch's watermark) before the state function
    * sees them — same contract as the built-in stateful operators;
    * on the bounded replay everything arrives in the first batch
    * (watermark 0), so nothing is ever late there. */
  def sessionize(ev: Dataset[(Long, java.sql.Timestamp, Long, Double)])
      : Dataset[ClosedSession] = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = 10L * 60 * 1000000
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[OpenSession], ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[Seq[OpenSession]]) =>
          val incoming = batch.map(e => OpenSession(e._3, e._3, 1L, e._4)).toSeq
          val merged = (state.getOption.getOrElse(Seq.empty) ++ incoming)
            .sortBy(s => (s.startUs, s.lastUs))
            .foldLeft(List.empty[OpenSession]) { (acc, cur) =>
              acc match {
                case h :: t if cur.startUs < h.lastUs + gapUs =>
                  OpenSession(h.startUs, math.max(h.lastUs, cur.lastUs),
                    h.n + cur.n, h.sv + cur.sv) :: t
                case _ => cur :: acc
              }
            }.reverse
          val wmMs = state.getCurrentWatermarkMs()
          val (closed, open) = merged.partition(s => s.lastUs + gapUs <= wmMs * 1000)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // fire iff wm >= ceil(endUs/1000) <=> timeout (strict <) at
            // ceil(endUs/1000) - 1; clamp above wm as the API requires
            val minEndMs = open.map(s => (s.lastUs + gapUs + 999) / 1000 - 1).min
            state.setTimeoutTimestamp(math.max(minEndMs, wmMs + 1))
          }
          closed.iterator.map(s =>
            ClosedSession(s.startUs, s.lastUs + gapUs, user, s.n, s.sv))
      }
  }

  /** s11's state machine: [[sessionize]]'s exact semantics re-derived
    * a THIRD time on `transformWithState` — Spark 4's arbitrary-state
    * v2 (`StatefulProcessor`) API — so one oracle now pins three
    * independent implementations (s05 built-in `session_window`, s09
    * `flatMapGroupsWithState`, s11 this): a divergence in any of the
    * merge / eviction / emission rules fails a hash gate. What v2
    * changes, exercised here: typed named state primitives (the open
    * sessions live in a `ListState[OpenSession]`, not one opaque
    * value), EXPLICIT per-key timers (registerTimer/deleteTimer/
    * listTimers, vs GroupState's single implicit timeout), and the
    * init/handleInputRows/handleExpiredTimer lifecycle. Timer
    * boundary: v2 expires timers with `expiry < watermark` — the
    * same strictly-below rule as GroupState timeouts — so the
    * ceil(endUs/1000)−1 arithmetic carries over unchanged. */
  class SessionProcessor
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long, Double),
        ClosedSession] {
    private val gapUs = 10L * 60 * 1000000
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    /** session_window's merge rule over the combined open+incoming
      * list — identical fold to [[sessionize]]. */
    private def merge(sessions: Seq[OpenSession]): List[OpenSession] =
      sessions.sortBy(s => (s.startUs, s.lastUs))
        .foldLeft(List.empty[OpenSession]) { (acc, cur) =>
          acc match {
            case h :: t if cur.startUs < h.lastUs + gapUs =>
              OpenSession(h.startUs, math.max(h.lastUs, cur.lastUs),
                h.n + cur.n, h.sv + cur.sv) :: t
            case _ => cur :: acc
          }
        }.reverse

    /** Emit watermark-closed sessions, persist the rest, and re-arm
      * the single per-key timer at the earliest open end. */
    private def flush(user: Long, merged: List[OpenSession], wmMs: Long)
        : Iterator[ClosedSession] = {
      val (closed, stillOpen) = merged.partition(s => s.lastUs + gapUs <= wmMs * 1000)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (stillOpen.isEmpty) open.clear()
      else {
        open.put(stillOpen.toArray)
        val minEndMs = stillOpen.map(s => (s.lastUs + gapUs + 999) / 1000 - 1).min
        getHandle.registerTimer(math.max(minEndMs, wmMs + 1))
      }
      closed.iterator.map(s =>
        ClosedSession(s.startUs, s.lastUs + gapUs, user, s.n, s.sv))
    }

    override def handleInputRows(
        user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
        tv: TimerValues): Iterator[ClosedSession] = {
      val incoming = rows.map(e => OpenSession(e._3, e._3, 1L, e._4)).toSeq
      flush(user, merge(open.get().toSeq ++ incoming), tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        user: Long, tv: TimerValues, info: ExpiredTimerInfo)
        : Iterator[ClosedSession] =
      flush(user, open.get().toList, tv.getCurrentWatermarkInMs())
  }

  /** [[SessionProcessor]] over any watermarked stream — factored out
    * like [[sessionize]] so the spec can drive it over a MemoryStream
    * with controlled multi-batch arrivals. */
  def twsSessionize(ev: Dataset[(Long, java.sql.Timestamp, Long, Double)])
      : Dataset[ClosedSession] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_._1)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** CUSTOM-STATE SESSIONIZATION on the v2 API — the s11 driver: the
    * same bounded replay, sink and output shape as
    * [[customStateSessions]], answered by the same oracle. The
    * engine requires the RocksDB state store provider for
    * `transformWithState` (virtual-column-family state layout), so
    * the conf is scoped to this query and restored after. */
  def twsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, sfDir)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val sessions = twsSessionize(ev)
    val out = tempDir("graft-tws-out")
    val ckpt = tempDir("graft-tws-ckpt")
    withStatePartitions(spark) {
      withRocksDb(spark) {
        val q = sessions.writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append").start()
        try q.processAllAvailable()
        finally q.stop()
      }
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(sessions.schema))
      .parquet(out.toString)
      .select(timestamp_micros(col("start_us")).as("sess_start"),
        timestamp_micros(col("end_us")).as("sess_end"),
        col("user_id"), col("n_events"), round(col("sv"), 2).as("sv"))
  }

  /** One buffered event awaiting watermark finalization inside
    * [[funnelize]]'s state: epoch-micros event time plus the funnel
    * stage it belongs to (1 = view, 2 = click, 3 = purchase). */
  case class FunnelEvent(tsUs: Long, stage: Int)

  /** Per-user funnel state: the not-yet-watermark-final event buffer
    * plus the monotone stage automaton (reached-stage timestamps in
    * epoch micros, -1 = unreached). The buffer holds only events
    * ABOVE the watermark — watermark-bounded, not stream-length-
    * bounded, like every other stateful operator here. */
  case class FunnelState(buf: Seq[FunnelEvent], t1: Long, t2: Long, t3: Long)

  /** One emitted per-user funnel resolution from [[funnelize]]. */
  case class FunnelRow(user_id: Long, t1_us: Long, t2_us: Long, t3_us: Long,
      reached: Int)

  /** STREAMING ORDERED FUNNEL — p58's strictly-ordered
    * view → click → purchase funnel as an incremental streaming
    * operator on `flatMapGroupsWithState`. The difficulty a batch
    * funnel never meets is ARRIVAL ORDER: stage k counts only if it
    * happens strictly after stage k-1, but a click can arrive before
    * the view that anchors it. The operator therefore buffers events
    * until the watermark passes them, then folds the newly-final
    * prefix into the automaton IN EVENT-TIME ORDER — below the
    * watermark no earlier event can still arrive, so the fold is
    * final and each stage assignment is monotone (set once, never
    * revised). Per-user state is the above-watermark buffer only.
    * Emission is append-style and QUIESCENCE-GATED, the funnel
    * analog of s09's "open sessions never emit": a user resolves
    * only when every buffered event is watermark-final (the buffer
    * drains empty at a timer firing); a user still holding events
    * above the watermark re-arms its timer and keeps waiting, so a
    * user whose last events ride inside the final watermark horizon
    * never emits — exactly the rule the oracle applies with its
    * max(ts) <= cutoff user filter. (In an unbounded stream a user
    * active again after resolving would open a fresh funnel and emit
    * a second row — each emission covers the watermark-complete
    * prefix since the last one; on the bounded replay timers only
    * fire once everything has arrived, so emission is unique.)
    *
    * 100 TB shape: one exchange on user_id into the state store;
    * state per user is bounded by the watermark horizon, not the
    * stream; output is one row per user. */
  def streamFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = eventsStream(spark, sfDir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .otherwise(3).as("stage"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Int)]
    val rows = funnelize(ev)
    val out = tempDir("graft-funnel-out")
    val ckpt = tempDir("graft-funnel-ckpt")
    withStatePartitions(spark) {
      val q = rows.writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.read.schema(org.apache.spark.sql.types.StructType(rows.schema))
      .parquet(out.toString)
      .select(col("user_id"),
        when(col("t1_us") >= 0, timestamp_micros(col("t1_us"))).as("t1"),
        when(col("t2_us") >= 0, timestamp_micros(col("t2_us"))).as("t2"),
        when(col("t3_us") >= 0, timestamp_micros(col("t3_us"))).as("t3"),
        col("reached"))
  }

  /** [[streamFunnel]]'s core on any watermarked
    * (user_id, ts, ts_us, stage) stream — factored out so the spec
    * can drive it over a MemoryStream with out-of-order cross-batch
    * arrivals (a click arriving a batch before its anchoring view),
    * which the single-batch bounded replay cannot exercise. */
  def funnelize(ev: Dataset[(Long, java.sql.Timestamp, Long, Int)])
      : Dataset[FunnelRow] = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // Fold the buffer's watermark-final prefix (ts <= cutUs) into the
    // automaton in ascending event-time order. Stage predicates are
    // STRICT (>), so processing order within an equal-timestamp tie
    // cannot change the outcome (a same-micro stage-k event never
    // qualifies against a same-micro stage-(k-1) anchor); the
    // (tsUs, stage) sort key just makes the walk fully deterministic.
    def fold(st: FunnelState, cutUs: Long): FunnelState = {
      val (fin, keep) = st.buf.partition(_.tsUs <= cutUs)
      var (t1, t2, t3) = (st.t1, st.t2, st.t3)
      fin.sortBy(e => (e.tsUs, e.stage)).foreach { e =>
        e.stage match {
          case 1 => if (t1 < 0) t1 = e.tsUs
          case 2 => if (t2 < 0 && t1 >= 0 && e.tsUs > t1) t2 = e.tsUs
          case _ => if (t3 < 0 && t2 >= 0 && e.tsUs > t2) t3 = e.tsUs
        }
      }
      FunnelState(keep, t1, t2, t3)
    }
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, java.sql.Timestamp, Long, Int)],
         state: GroupState[FunnelState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000
          if (state.hasTimedOut) {
            val st = fold(state.get, wmUs)
            if (st.buf.isEmpty) {
              // the user's whole story is watermark-final: resolve
              state.remove()
              Iterator.single(FunnelRow(user, st.t1, st.t2, st.t3,
                Seq(st.t1, st.t2, st.t3).count(_ >= 0)))
            } else {
              // events above the watermark are still pending — hold
              // the emission and try again on the next advance
              state.update(st)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
              Iterator.empty
            }
          } else {
            val prev = state.getOption.getOrElse(FunnelState(Nil, -1L, -1L, -1L))
            val withNew = prev.copy(
              buf = prev.buf ++ batch.map(e => FunnelEvent(e._3, e._4)))
            state.update(fold(withNew, wmUs))
            // fire on the next watermark advance (the API requires the
            // timeout strictly above the current watermark)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** Scope the RocksDB state store provider (a transformWithState
    * requirement) to `body`, restoring the session default after. */
  private def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The events table consumed as a bounded stream, with `ts`
    * normalized to µs TimestampType across the representations the
    * driver's generator has shipped: raw TIMESTAMP(NANOS) longs
    * (legacy nanosAsLong read) and unadjusted TIMESTAMP(MICROS) read
    * as TIMESTAMP_NTZ (value-preserving cast under the UTC session
    * timezone). Same normalization as [[graft.Tables.events]].
    *
    * Handles BOTH table layouts: a single parquet FILE named
    * `events.parquet` (the driver's testdata) and the standard
    * Spark-written DIRECTORY `events.parquet/part-*.parquet` (what
    * any `df.write.parquet` — including ScaleUp — produces). The
    * round-9 sf1.0 sweep showed why this must be explicit: a
    * `pathGlobFilter=events.parquet` over the parent dir matches no
    * leaf file in the directory layout, so every streaming query
    * silently measured an EMPTY stream. We therefore (a) branch on
    * the actual layout and (b) refuse to return a zero-file stream —
    * an empty discovery is an error, never an answer. */
  private def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tablePath = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(tablePath).schema
    val hp = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(hp) // throws if the table is absent
    val raw =
      if (status.isDirectory) {
        // Same leaf-file discovery the stream will do: non-recursive
        // children minus the `_`/`.`-prefixed metadata files Spark's
        // file listing always skips (_SUCCESS, .crc sidecars). No
        // extension glob — part files aren't guaranteed a .parquet
        // suffix, and batch/stream must discover the same set.
        val leaves = fs.listStatus(hp).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        require(leaves.nonEmpty,
          s"streaming source discovered zero data files under $tablePath — " +
            "refusing to stream an empty table")
        spark.readStream.schema(schema).parquet(tablePath)
      } else {
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      }
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integral DIV: `/` would be DOUBLE division and lose sub-µs
        // bits on ~1.7e18 nano values
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Temp dir for a sink/checkpoint, removed on JVM exit — the
    * returned DataFrames read the sink dir lazily for the rest of the
    * process, so cleanup must not run earlier. */
  private def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      catch { case _: Exception => () }
      finally s.close()
    }))
    p
  }

  /** Runs `body` with `spark.sql.shuffle.partitions` sized for the
    * stateful-streaming state, then restores the session default.
    * Shuffle partitions fix the state-store partition count for the
    * life of a streaming query, so they must be sized to STATE volume
    * (windows in flight × event types — tiny here), not to the batch
    * default: every micro-batch pays per-state-partition task and
    * store-commit overhead regardless of data volume. On a real
    * cluster this is the knob a production job sets per stream. */
  private def withStatePartitions[A](spark: SparkSession, n: Int = 4)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** State-store partition count for queries whose state volume grows
    * with the EVENT COUNT (stream-stream join buffers, dedup key sets)
    * rather than with windows-in-flight. The count is fixed for the
    * life of the query, so it must be sized before start: scale it
    * with the source's size so per-partition state stays ~bounded as
    * SF grows. n=4 was tuned at sf0.1 (~2 MB / 100k events); the
    * round-10 sf1.0 sweep showed why the constant doesn't survive a
    * 10× corpus — s04's interval join went 6× (20.8 s) buffering
    * 10× the rows into the same 4 stores (VERDICT r10 #3). Partition
    * count does not affect RESULTS, only state layout/parallelism —
    * the oracle rows are invariant to it. */
  /** `fraction`: how much of the source actually reaches the stateful
    * operator (s08/s10 filter each side to id % 3 — sizing their
    * stores for the FULL stream measured 1.5× slower at sf1.0 than
    * sizing for the filtered third: per-partition store-commit
    * overhead outweighs the parallelism once state per store is
    * small). */
  private def volumeStatePartitions(spark: SparkSession, sfDir: String,
      fraction: Double = 1.0): Int = {
    val hp = new org.apache.hadoop.fs.Path(s"$sfDir/events.parquet")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      try fs.getContentSummary(hp).getLength
      catch { case _: Exception => 0L }
    // ~2 MB of events parquet per 4 state partitions, clamped to the
    // local core budget; a real cluster raises the clamp with it.
    math.max(4, math.min(32, (4L * (bytes * fraction).toLong / (2L << 20)).toInt))
  }

  /** Per-user running event counts via `mapGroupsWithState` — the
    * custom-state primitive (reference has no analog; pinned by
    * StreamingSpec over a MemoryStream). Update-mode output: one
    * (user, newCount) row per user per micro-batch. */
  def runningUserCounts(events: Dataset[(Long, String)]): Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)] {
        (user: Long, batch: Iterator[(Long, String)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          (user, n)
      }
  }
}
