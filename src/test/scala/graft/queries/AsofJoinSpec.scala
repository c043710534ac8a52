package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}
import graft.operators.AsofJoin

/** operators/AsofJoin — semantics on hand-checked vectors (inclusive
  * same-instant match, no-prior-row null, per-key isolation,
  * same-timestamp tie determinism) and the scale claim: the composed
  * plan contains NO join operator and exactly one shuffle (the per-key
  * hash partitioning), so it can never degenerate into a range-join
  * pair explosion. */
class AsofJoinSpec extends SparkSpec {

  private def ts(sec: Long) = to_timestamp(lit(sec))

  test("latestPrior matches the most recent at-or-before right row per key") {
    import spark.implicits._
    val purchases = Seq((1L, 1L, 15L), (2L, 1L, 20L), (3L, 1L, 5L), (4L, 2L, 50L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val views = Seq((100L, 1L, 10L), (101L, 1L, 20L), (200L, 3L, 1L))
      .toDF("view_id", "user_id", "sec")
      .select(col("view_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val got = AsofJoin.latestPrior(purchases, views, Seq("user_id"), "ts",
        Seq(col("_r.view_id")))
      .select(col("event_id"), col("asof.view_id").as("view_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(100L), // view@10 is the latest <= purchase@15
      2L -> Some(101L), // view@20 matches purchase@20: inclusive
      3L -> None,       // no view at or before t=5
      4L -> None))      // user 2 has no views; user 3's never leak
  }

  test("same-timestamp right rows resolve deterministically via the tie-break") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val right = Seq((101L, 1L, 10L), (103L, 1L, 10L), (102L, 1L, 10L))
      .toDF("view_id", "user_id", "sec")
      .select(col("view_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val got = AsofJoin.latestPrior(left, right, Seq("user_id"), "ts",
        Seq(col("_r.view_id")))
      .select(col("asof.view_id")).as[Long].collect().toSeq
    assert(got === Seq(103L)) // last in (view_id asc) order wins
  }

  test("null-key left rows get a null asof, never a null-key right match") {
    import spark.implicits._
    val left = Seq((1L, Some(1L), 10L), (2L, None, 10L))
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val right = Seq((100L, Some(1L), 5L), (200L, None, 5L))
      .toDF("view_id", "user_id", "sec")
      .select(col("view_id"), col("user_id"), to_timestamp(col("sec")).as("ts"))
    val got = AsofJoin.latestPrior(left, right, Seq("user_id"), "ts")
      .select(col("event_id"), col("asof.view_id").as("view_id"))
      .as[(Long, Option[Long])].collect().toMap
    // SQL join equality: NULL = NULL is not a match
    assert(got === Map(1L -> Some(100L), 2L -> None))
  }

  test("reserved output and internal names are rejected up front") {
    import spark.implicits._
    val withAsof = Seq((1L, 2L)).toDF("asof", "user_id")
    intercept[IllegalArgumentException] {
      AsofJoin.latestPrior(withAsof, withAsof, Seq("user_id"), "asof")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.latestPrior(Seq((1L, 2L)).toDF("_t", "x"),
        Seq((1L, 2L)).toDF("_t", "x"), Seq("_t"), "x")
    }
  }

  test("q39 plan is join-free with exactly one shuffle on the key") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q39_asof_join")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan
      assert(!plan.toString.contains("Join"),
        s"as-of must be composed without any join operator:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.length === 1,
        s"expected exactly the per-key hash exchange, got:\n$plan")
      assert(shuffles.head.outputPartitioning.toString.contains("user_id"),
        s"shuffle must partition by the as-of key:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
