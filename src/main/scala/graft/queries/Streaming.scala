package graft.queries

/** Streaming operators exposed as verifiable queries: each runs a
  * BOUNDED streaming query through the real Structured Streaming path
  * and returns the final result, which the driver compares against the
  * batch oracle — streaming and batch must agree on bounded input. */
object Streaming {
  val all: Vector[QDef] = Vector(
    QDef(
      "s01_stream_window",
      (s, d) => graft.streaming.StreamOps.windowedEventCounts(s, d),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
             |  count(*) AS c, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Append-mode/file-sink variant: only watermark-finalized windows
    // (end <= max(ts) - 1 hour) are emitted — the oracle applies the
    // same rule, pinning the emission semantics.
    QDef(
      "s02_stream_append",
      (s, d) => graft.streaming.StreamOps.appendWindowCounts(s, d),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
             |  count(*) AS c, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2
             |HAVING h + INTERVAL 2 HOUR <= (SELECT max(ts) FROM events)""".stripMargin)),

    // Streaming dedup: every event delivered twice (two unioned
    // sources), dropDuplicatesWithinWatermark restores exactly-once
    // before the windowed agg — so the oracle is the SINGLE-copy
    // batch answer under the same append emission rule as s02. A
    // wrong or missing dedup doubles every count and hash-mismatches.
    QDef(
      "s03_stream_dedup",
      (s, d) => graft.streaming.StreamOps.dedupWindowCounts(s, d),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type,
             |  count(*) AS c, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2
             |HAVING h + INTERVAL 2 HOUR <= (SELECT max(ts) FROM events)""".stripMargin)),

    // Stream-stream interval join: watermarked event-time range join
    // on user. Inner matches emit as soon as both rows arrive, so on
    // bounded input the result is EXACTLY the batch join — the oracle
    // — while state stays bounded by watermark + range eviction.
    QDef(
      "s04_stream_join",
      (s, d) => graft.streaming.StreamOps.intervalJoinPairs(s, d),
      // the µs truncation (epoch_ns // 1000) mirrors the Spark side's
      // `ts DIV 1000`: the 10-minute bound must be evaluated on the
      // same precision or sub-µs remainders could flip boundary pairs
      Some("""WITH e AS (
             |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |         user_id, event_type
             |  FROM events
             |)
             |SELECT a.event_id AS ida, b.event_id AS idb, a.user_id,
             |  a.event_type AS type_a, b.event_type AS type_b,
             |  CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_s
             |FROM e a JOIN e b ON a.user_id = b.user_id
             |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
             |  AND a.event_id < b.event_id""".stripMargin)),

    // Session windows: per-user sessions closing after 10 idle
    // minutes (dynamic merged windows — the shape fixed windows can't
    // express). The oracle recomputes sessions as a batch gaps-and-
    // islands pass: a session BREAK is ts >= prev_ts + gap (Spark
    // merges while event intervals [ts, ts+gap) overlap, i.e. the
    // end bound is exclusive), session end = last ts + gap, and only
    // watermark-closed sessions (end <= max(ts) − 1 hour) emit, same
    // rule as s02. Hash compare therefore pins the merge semantics,
    // the end arithmetic AND the append emission rule.
    QDef(
      "s05_stream_session",
      (s, d) => graft.streaming.StreamOps.sessionWindowStats(s, d),
      Some("""WITH e AS (
             |  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |         user_id, value
             |  FROM events
             |), m AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), s AS (
             |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m
             |)
             |SELECT min(ts) AS sess_start,
             |  max(ts) + INTERVAL 10 MINUTE AS sess_end,
             |  user_id, count(*) AS n_events, round(sum(value), 2) AS sv
             |FROM s GROUP BY user_id, sid
             |HAVING sess_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM e)""".stripMargin)),

    // Sliding windows: 1-hour windows every 30 minutes — each event
    // belongs to exactly two windows (the bucket it falls in and the
    // one starting 30 minutes earlier), which the oracle derives from
    // epoch arithmetic (integer 1800-second buckets — origin-free, so
    // no time_bucket origin-convention risk); emission rule as s02
    // (window end <= max(ts) − 1 hour delay).
    QDef(
      "s06_stream_sliding",
      (s, d) => graft.streaming.StreamOps.slidingWindowCounts(s, d),
      Some("""WITH e AS (
             |  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |         event_type, value
             |  FROM events
             |), w AS (
             |  SELECT unnest([
             |      make_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 * 1000000),
             |      make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 1800) - 1) * 1800 * 1000000)
             |    ]) AS wstart, event_type, value
             |  FROM e
             |)
             |SELECT wstart, event_type, count(*) AS c, round(sum(value), 2) AS sv
             |FROM w GROUP BY 1, 2
             |HAVING wstart + INTERVAL 2 HOUR <= (SELECT max(ts) FROM e)""".stripMargin)),

    // Stream-static enrichment: the event stream joins the customer
    // dimension (broadcast inside every micro-batch; stateless). On
    // bounded input the result is exactly the batch join.
    QDef(
      "s07_stream_enrich",
      (s, d) => graft.streaming.StreamOps.enrichedEvents(s, d),
      Some("""SELECT event_id, user_id, event_type,
             |  c_mktsegment, c_nationkey, value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)),

    // Left-outer stream-stream join: matches emit on arrival, but an
    // UNMATCHED left row emits its null-padded result only when the
    // global watermark (min of the two sources' max ts − 1 hour)
    // passes its join-window end — null emission is a state-eviction
    // event. Lefts whose window is still open when the bounded replay
    // ends never emit; the oracle reproduces that exact rule, so the
    // hash compare pins the eviction semantics (see
    // StreamOps.leftJoinAttribution).
    QDef(
      "s08_stream_left_join",
      (s, d) => graft.streaming.StreamOps.leftJoinAttribution(s, d),
      Some("""WITH e AS (
             |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id
             |  FROM events
             |), a AS (SELECT * FROM e WHERE event_id % 3 = 0),
             |b AS (SELECT * FROM e WHERE event_id % 3 = 1),
             |wm AS (
             |  SELECT least((SELECT max(ts) FROM a), (SELECT max(ts) FROM b))
             |           - INTERVAL 1 HOUR AS w
             |), m AS (
             |  SELECT a.event_id AS ida, b.event_id AS idb, a.user_id,
             |         CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_s
             |  FROM a JOIN b ON a.user_id = b.user_id
             |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
             |), unmatched AS (
             |  SELECT a.event_id AS ida, CAST(NULL AS BIGINT) AS idb, a.user_id,
             |         CAST(NULL AS BIGINT) AS gap_s
             |  FROM a, wm
             |  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id
             |      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE)
             |    AND a.ts + INTERVAL 10 MINUTE < wm.w
             |)
             |SELECT * FROM m UNION ALL SELECT * FROM unmatched""".stripMargin)),

    // Full-outer stream-stream join: both sides' unmatched rows are
    // state-eviction emissions with ASYMMETRIC watermark bounds
    // derived from the time-range condition — left nulls flush when
    // the watermark passes a.ts + 10 min (the join-window end), right
    // nulls when it passes b.ts (a future left would need
    // a.ts <= b.ts). The oracle reproduces both rules.
    QDef(
      "s10_stream_full_join",
      (s, d) => graft.streaming.StreamOps.fullJoinAttribution(s, d),
      Some("""WITH e AS (
             |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, user_id
             |  FROM events
             |), a AS (SELECT * FROM e WHERE event_id % 3 = 0),
             |b AS (SELECT * FROM e WHERE event_id % 3 = 1),
             |wm AS (
             |  SELECT least((SELECT max(ts) FROM a), (SELECT max(ts) FROM b))
             |           - INTERVAL 1 HOUR AS w
             |), m AS (
             |  SELECT a.event_id AS ida, b.event_id AS idb, a.user_id,
             |         CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT) AS gap_s
             |  FROM a JOIN b ON a.user_id = b.user_id
             |    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
             |), unmatched_a AS (
             |  SELECT a.event_id AS ida, CAST(NULL AS BIGINT) AS idb, a.user_id,
             |         CAST(NULL AS BIGINT) AS gap_s
             |  FROM a, wm
             |  WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = a.user_id
             |      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE)
             |    AND a.ts + INTERVAL 10 MINUTE < wm.w
             |), unmatched_b AS (
             |  SELECT CAST(NULL AS BIGINT) AS ida, b.event_id AS idb, b.user_id,
             |         CAST(NULL AS BIGINT) AS gap_s
             |  FROM b, wm
             |  WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.user_id = b.user_id
             |      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE)
             |    AND b.ts < wm.w
             |)
             |SELECT * FROM m UNION ALL SELECT * FROM unmatched_a
             |UNION ALL SELECT * FROM unmatched_b""".stripMargin)),

    // Custom-state sessionization: s05's exact semantics re-derived
    // from the arbitrary-state primitive (flatMapGroupsWithState +
    // event-time timeout) instead of the built-in session_window —
    // same oracle, so the hash compare pins the hand-rolled merge /
    // eviction / emission logic against the engine-native answer.
    QDef(
      "s09_stream_custom_state",
      (s, d) => graft.streaming.StreamOps.customStateSessions(s, d),
      Some("""WITH e AS (
             |  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |         user_id, value
             |  FROM events
             |), m AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), s AS (
             |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m
             |)
             |SELECT min(ts) AS sess_start,
             |  max(ts) + INTERVAL 10 MINUTE AS sess_end,
             |  user_id, count(*) AS n_events, round(sum(value), 2) AS sv
             |FROM s GROUP BY user_id, sid
             |HAVING sess_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM e)""".stripMargin)),

    // Arbitrary-state v2: the same pinned session semantics a THIRD
    // time, on Spark 4's transformWithState / StatefulProcessor API
    // (typed ListState + explicit event-time timers + lifecycle
    // hooks, RocksDB state store). One oracle, three independent
    // stateful implementations — s05 session_window, s09
    // flatMapGroupsWithState, s11 this — so any divergence in merge /
    // eviction / emission semantics across the engine's three state
    // APIs fails a hash gate.
    QDef(
      "s11_stream_tws_session",
      (s, d) => graft.streaming.StreamOps.twsSessions(s, d),
      Some("""WITH e AS (
             |  SELECT make_timestamp(epoch_ns(ts) // 1000) AS ts,
             |         user_id, value
             |  FROM events
             |), m AS (
             |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), s AS (
             |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m
             |)
             |SELECT min(ts) AS sess_start,
             |  max(ts) + INTERVAL 10 MINUTE AS sess_end,
             |  user_id, count(*) AS n_events, round(sum(value), 2) AS sv
             |FROM s GROUP BY user_id, sid
             |HAVING sess_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM e)""".stripMargin)),

    // Streaming ordered funnel: p58's strictly-ordered
    // view → click → purchase funnel computed INCREMENTALLY — events
    // buffer per user until the watermark passes them, then fold into
    // a monotone stage automaton in event-time order (below the
    // watermark no earlier arrival is possible, so assignments are
    // final), one row per user emitted by its event-time timer once
    // its whole buffer is watermark-final (the quiescence gate — the
    // funnel analog of s05/s09's open-sessions-never-emit rule). The
    // oracle replicates both rules: the cutoff CTE is the engine's
    // ms-floored watermark (floor-to-ms of max event time minus the
    // 1-hour delay) and the user filter keeps only users whose LAST
    // event is at or below it — so buffering, event-time ordering,
    // strict-after stage rules AND the append emission rule are all
    // hash-verified.
    QDef(
      "s12_stream_funnel",
      (s, d) => graft.streaming.StreamOps.streamFunnel(s, d),
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         make_timestamp(epoch_ns(ts) // 1000) AS ts
             |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
             |), cut AS (
             |  SELECT make_timestamp(
             |    ((epoch_ns(max(ts)) // 1000000) - 3600000) * 1000) AS c
             |  FROM e
             |), u AS (
             |  SELECT user_id FROM e GROUP BY 1
             |  HAVING max(ts) <= (SELECT c FROM cut)
             |), el AS (
             |  SELECT e.* FROM e JOIN u USING (user_id)
             |), t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM el
             |  WHERE event_type = 'view' GROUP BY 1
             |), t2 AS (
             |  SELECT el.user_id, min(el.ts) AS t2
             |  FROM el JOIN t1 ON el.user_id = t1.user_id
             |  WHERE el.event_type = 'click' AND el.ts > t1.t1 GROUP BY 1
             |), t3 AS (
             |  SELECT el.user_id, min(el.ts) AS t3
             |  FROM el JOIN t2 ON el.user_id = t2.user_id
             |  WHERE el.event_type = 'purchase' AND el.ts > t2.t2 GROUP BY 1
             |)
             |SELECT u.user_id, t1.t1, t2.t2, t3.t3,
             |  CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
             |            WHEN t2.t2 IS NOT NULL THEN 2
             |            WHEN t1.t1 IS NOT NULL THEN 1
             |            ELSE 0 END AS INT) AS reached
             |FROM u LEFT JOIN t1 USING (user_id)
             |       LEFT JOIN t2 USING (user_id)
             |       LEFT JOIN t3 USING (user_id)""".stripMargin))
  )
}
