package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stateful-streaming throughput micro-benchmark: drives N synthetic
  * events through the real Structured Streaming path — MemoryStream
  * source → event-time watermark → tumbling-window aggregation →
  * memory sink — in fixed-size micro-batches, so the number includes
  * the per-micro-batch state-store commit cost that dominates
  * small-batch streaming, not just the aggregation arithmetic.
  *
  * The event stream is deterministic (event i: ts = i DIV 20
  * seconds from epoch, type = i % 7, value = i % 1000), so the final
  * windowed state is exactly checkable: total count across windows
  * must equal N and the distinct (window, type) count is derived from
  * the same formulas — a wrong watermark or dropped batch fails the
  * bench instead of inflating it. State volume is (hours in flight ×
  * 7 types), decoupled from N, the same shape argument as the s01-s07
  * operators; shuffle partitions are sized to state like StreamOps
  * does.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val batches = 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4") // sized to state
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Long]
    val events = input.toDS()
      .select(
        timestamp_seconds(col("value") / 20L).as("ts"),
        (col("value") % 7).cast("string").as("event_type"),
        (col("value") % 1000).cast("double").as("v"))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"), sum("v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("graft_stream_bench")
      .outputMode("complete").start()

    val per = n / batches
    val t0 = System.nanoTime()
    try {
      var b = 0L
      while (b < batches) {
        input.addData(b * per until (b + 1) * per)
        q.processAllAvailable()
        b += 1
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9

    val result = spark.table("graft_stream_bench")
      .agg(sum("c").as("total"), count(lit(1)).as("groups")).head()
    val total = result.getLong(0)
    val groups = result.getLong(1)
    // expected groups: hours span = ceil((n/20)/3600) windows × 7 types
    val hours = ((n / 20L) + 3599L) / 3600L
    val ok = total == per * batches && groups == hours * 7
    println(f"[stream-bench] events=${per * batches} batches=$batches " +
      f"groups=$groups (expect ${hours * 7}) total=$total wall=$secs%.2f s " +
      f"(${per * batches / secs}%.0f events/s) check=${if (ok) "OK" else "FAIL"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
