package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the custom-state streaming primitive over a MemoryStream:
  * mapGroupsWithState keeps per-user counts across micro-batches. */
class StreamingSpec extends SparkSpec {

  test("mapGroupsWithState running counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val counts = StreamOps.runningUserCounts(input.toDS())
    val q = counts.writeStream.format("memory").queryName("g_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1L, "a"), (1L, "b"), (2L, "c"))
      q.processAllAvailable()
      val batch1 = spark.table("g_counts").as[(Long, Long)].collect().toSet
      assert(batch1 == Set((1L, 2L), (2L, 1L)))

      input.addData((1L, "d"), (3L, "e"))
      q.processAllAvailable()
      val all = spark.table("g_counts").as[(Long, Long)].collect().toSeq
      // update mode appends the batch-2 updates to the sink
      assert(all.count(_ == (1L, 3L)) == 1)
      assert(all.count(_ == (3L, 1L)) == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization merges across micro-batches") {
    // Cross-batch semantics the bounded single-file replay can't
    // exercise: batch 2 EXTENDS a session opened in batch 1, opens
    // two more that merge with each other but not with it, and
    // advances the watermark so the no-data batch's event-time
    // timeout closes everything except the newest session.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Long, Double)] // (user, seconds, value)
    val ev = input.toDS()
      .select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"),
        unix_micros(timestamp_seconds(col("_2"))).as("ts_us"),
        col("_3").as("value"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val q = StreamOps.sessionize(ev)
      .writeStream.format("memory").queryName("g_fmgws")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: max ts 10300 → watermark 6700 for batch 2, so every
      // batch-2 event below is on time (the engine drops late rows
      // before the state function sees them)
      input.addData((1L, 10000L, 1.0), (1L, 10300L, 1.0), (2L, 10100L, 1.0))
      q.processAllAvailable() // wm 0 during the batch: nothing closes
      input.addData(
        (1L, 10550L, 1.0), // extends batch 1's [10000,10300] session
        (1L, 12500L, 1.0), (1L, 13099L, 1.0), // merge with each other only
        (1L, 15000L, 1.0), // third session
        (99L, 20000L, 1.0)) // pushes the final watermark to 16400s
      q.processAllAvailable() // timeout batch closes everything but user 99
      val rows = spark.table("g_fmgws")
        .select(col("start_us") / 1000000, col("end_us") / 1000000,
          col("user_id"), col("n_events"))
        .as[(Double, Double, Long, Long)].collect().toSet
      assert(rows == Set(
        (10000.0, 11150.0, 1L, 3L), // batch-2 event 10550 merged cross-batch
        (12500.0, 13699.0, 1L, 2L), // 13099 within the 600s gap; 15000 is not
        (15000.0, 15600.0, 1L, 1L),
        (10100.0, 10700.0, 2L, 1L))) // user 99 (end 20600 > wm 16400) never emits
    } finally q.stop()
  }

  test("transformWithState sessionization matches the v1 path cross-batch") {
    // The SAME multi-batch scenario as the flatMapGroupsWithState test
    // above, driven through the StatefulProcessor (arbitrary-state v2)
    // implementation: cross-batch session extension, in-batch merge,
    // timer-driven close on the watermark-only batch, and the
    // never-emits-while-open rule must all reproduce identically.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Long, Double)] // (user, seconds, value)
    val ev = input.toDS()
      .select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"),
        unix_micros(timestamp_seconds(col("_2"))).as("ts_us"),
        col("_3").as("value"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Double)]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamOps.twsSessionize(ev)
        .writeStream.format("memory").queryName("g_tws")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((1L, 10000L, 1.0), (1L, 10300L, 1.0), (2L, 10100L, 1.0))
        q.processAllAvailable()
        input.addData(
          (1L, 10550L, 1.0),
          (1L, 12500L, 1.0), (1L, 13099L, 1.0),
          (1L, 15000L, 1.0),
          (99L, 20000L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("g_tws")
          .select(col("start_us") / 1000000, col("end_us") / 1000000,
            col("user_id"), col("n_events"))
          .as[(Double, Double, Long, Long)].collect().toSet
        assert(rows == Set(
          (10000.0, 11150.0, 1L, 3L),
          (12500.0, 13699.0, 1L, 2L),
          (15000.0, 15600.0, 1L, 1L),
          (10100.0, 10700.0, 2L, 1L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("watermark bounds windowed-agg state across micro-batches") {
    // The scale claim behind every watermark op: rows in the state
    // store plateau at (in-flight windows × keys), independent of how
    // many batches replay. 12 batches, each advancing event time by a
    // full hour window; monotonic state growth fails here.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Long]
    val agg = input.toDS()
      .select(timestamp_seconds(col("value")).as("ts"),
        (col("value") % 3).cast("string").as("k"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("c"))
    val q = agg.writeStream.format("memory").queryName("g_state_pin")
      .outputMode(OutputMode.Append()).start()
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      for (b <- 0L until 12L) {
        input.addData(b * 3600L until (b + 1) * 3600L)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    val (head, tail) = stateRows.splitAt(stateRows.length / 2)
    assert(head.nonEmpty && tail.nonEmpty, s"no state progress captured: $stateRows")
    assert(tail.max <= head.max,
      s"state grows with batch count — eviction broken: $stateRows")
    assert(stateRows.last > 0, s"state should hold the in-flight windows: $stateRows")
  }

  test("watermark bounds stream-stream join state across micro-batches") {
    // Same plateau claim for the join state stores (s04/s08/s10's
    // shape): both sides buffer only rows inside watermark ± the join
    // interval, so replaying 12 one-hour batches must not grow state
    // monotonically. A missing range condition or watermark here
    // makes state retain every row ever seen — tail.max blows past
    // head.max and this fails.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = MemoryStream[Long]
    val right = MemoryStream[Long]
    val l = left.toDS()
      .select(timestamp_seconds(col("value")).as("lts"),
        (col("value") % 7).cast("string").as("lk"))
      .withWatermark("lts", "30 minutes")
    val r = right.toDS()
      .select(timestamp_seconds(col("value")).as("rts"),
        (col("value") % 7).cast("string").as("rk"))
      .withWatermark("rts", "30 minutes")
    val joined = l.join(r,
      expr("""lk = rk AND rts BETWEEN lts - INTERVAL 10 MINUTES
             |              AND lts + INTERVAL 10 MINUTES""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("j_state_pin")
      .outputMode(OutputMode.Append()).start()
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      for (b <- 0L until 12L) {
        left.addData(b * 3600L until b * 3600L + 600L)
        right.addData(b * 3600L until b * 3600L + 600L)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators.map(_.numRowsTotal).sum
      }
    } finally q.stop()
    val (head, tail) = stateRows.splitAt(stateRows.length / 2)
    assert(head.nonEmpty && tail.nonEmpty, s"no state progress captured: $stateRows")
    assert(tail.max <= head.max,
      s"join state grows with batch count — eviction broken: $stateRows")
    assert(stateRows.last > 0, s"state should hold the in-watermark rows: $stateRows")
  }

  test("bounded stream windowed agg equals the batch answer") {
    val d = "/root/testdata/sf0.001"
    val streamed = StreamOps.windowedEventCounts(spark, d)
    import org.apache.spark.sql.functions._
    val batch = graft.Tables.events(spark, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("sv"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("directory-shaped events table streams identically to the single-file layout") {
    // The round-9 sf1.0 sweep's silent hole: a Spark-WRITTEN events
    // table is a DIRECTORY events.parquet/part-*.parquet, which the
    // old pathGlobFilter=events.parquet discovery matched zero files
    // of — every streaming query returned empty without erroring.
    // Pin both layouts to the same answer.
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$d/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-dirlayout").toString
    raw.repartition(3).write.parquet(s"$dir/events.parquet")
    val single = StreamOps.windowedEventCounts(spark, d)
    val asDir = StreamOps.windowedEventCounts(spark, dir)
    assert(asDir.count() > 0, "directory layout streamed an empty result")
    assert(asDir.count() === single.count())
    assert(asDir.exceptAll(single).isEmpty && single.exceptAll(asDir).isEmpty)
  }

  test("an events table with zero data files is an error, not an empty stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-emptytable")
    java.nio.file.Files.createDirectory(dir.resolve("events.parquet"))
    java.nio.file.Files.createFile(dir.resolve("events.parquet").resolve("_SUCCESS"))
    // Empty discovery must surface loudly (schema inference or the
    // zero-file guard) — never as a zero-row streaming answer.
    assertThrows[Exception] {
      StreamOps.windowedEventCounts(spark, dir.toString).count()
    }
  }

  test("sliding windows put every event in exactly window/slide windows") {
    // 1-hour window / 30-minute slide → each event contributes to 2
    // windows, so the total event count across windows is exactly 2×
    // the corpus (independently of the append emission cut, summing
    // the UNCUT batch expansion).
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
    val expanded = ev
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val total = expanded.agg(sum("c")).head().getLong(0)
    assert(total === 2L * ev.count())
  }

  test("stream-static enrichment joins by broadcast, stateless") {
    val d = "/root/testdata/sf0.001"
    val out = StreamOps.enrichedEvents(spark, d)
    // every event matches exactly one customer row
    assert(out.count() === graft.Tables.events(spark, d).count())
    // the same join built in batch planning broadcasts the dim side
    import org.apache.spark.sql.functions._
    val dim = broadcast(spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")))
    val plan = graft.Tables.events(spark, d)
      .join(dim, col("user_id") === col("c_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }

  test("funnelize resolves out-of-order cross-batch arrivals in event-time order") {
    // The scenario the bounded single-batch replay cannot exercise: a
    // click arrives a BATCH BEFORE the view that anchors it (but
    // inside the watermark horizon, so the engine does not drop it).
    // The fold must still order by event time: view@9000 anchors
    // click@10000 anchors purchase@10500. Also pinned: the strict-
    // after rule on an equal-timestamp tie (user 2), stage events
    // before their anchor being ignored (user 3's early purchase),
    // and the quiescence gate (user 99's event sits above the final
    // watermark, so user 99 holds its buffer and never emits).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Long, Int)] // (user, seconds, stage)
    val ev = input.toDS()
      .select(col("_1").as("user_id"),
        timestamp_seconds(col("_2")).as("ts"),
        unix_micros(timestamp_seconds(col("_2"))).as("ts_us"),
        col("_3").as("stage"))
      .withWatermark("ts", "1 hour")
      .as[(Long, java.sql.Timestamp, Long, Int)]
    val q = StreamOps.funnelize(ev)
      .writeStream.format("memory").queryName("g_funnel")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: max ts 10500 → watermark 6900 for batch 2
      input.addData(
        (1L, 10000L, 2), (1L, 10500L, 3), // click+purchase before their view
        (2L, 10000L, 1), (2L, 10000L, 2), // same-micro tie: click must NOT count
        (3L, 9000L, 3), (3L, 10000L, 2), (3L, 10200L, 3)) // early purchase ignored
      q.processAllAvailable()
      assert(spark.table("g_funnel").isEmpty) // wm 0: nothing resolved yet
      input.addData(
        (1L, 9000L, 1),   // the out-of-order view (9000 > wm 6900: on time)
        (3L, 9500L, 1),
        (99L, 20000L, 1)) // pushes the final watermark to 16400s
      q.processAllAvailable() // watermark-only batch fires every timer
      def secs(us: Long): Long = if (us < 0) -1L else us / 1000000
      val rows = spark.table("g_funnel")
        .as[StreamOps.FunnelRow].collect()
        .map(r => (r.user_id, secs(r.t1_us), secs(r.t2_us),
          secs(r.t3_us), r.reached)).toSet
      assert(rows == Set(
        (1L, 9000L, 10000L, 10500L, 3),
        (2L, 10000L, -1L, -1L, 1),
        (3L, 9500L, 10000L, 10200L, 3)), rows) // 99 still buffered: no emit
    } finally q.stop()
  }
}
