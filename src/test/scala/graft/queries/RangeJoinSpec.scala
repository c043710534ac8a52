package graft.queries

import graft.{SparkSpec, SparkEntry}
import graft.operators.RangeJoin

/** operators/RangeJoin — hand-checked half-open containment semantics
  * (start inclusive, end exclusive, overlap multi-match, empty
  * intervals dropped, bucket-boundary points) and the scale claim:
  * the composed plan is an equi-join — broadcast hash join here,
  * never a nested loop over the cross product. */
class RangeJoinSpec extends SparkSpec {

  test("pointInInterval matches half-open intervals exactly") {
    import spark.implicits._
    val points = Seq((1L, 0L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, 10L, 20L), // [10,20): catches p=10, p=19; NOT p=20
      (11L, 15L, 40L), // overlaps the first: p=19 matches both
      (12L, 7L, 7L))   // empty: dropped
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        bucketWidth = 8L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 10L),            // start-inclusive
      (3L, 10L), (3L, 11L), // overlap multi-match
      (4L, 11L),            // p=20 excluded from [10,20), inside [15,40)
      (5L, 11L)))
    // p=0 (before all) and the empty interval produce nothing
  }

  test("bucket width does not change the answer") {
    import spark.implicits._
    val points = (0L to 50L).map(p => (p, p)).toDF("pid", "p")
    val intervals = Seq((1L, 3L, 17L), (2L, 16L, 16L), (3L, 40L, 51L))
      .toDF("iid", "s", "e")
    val expect = (for {
      p <- 0L to 50L
      (iid, s, e) <- Seq((1L, 3L, 17L), (3L, 40L, 51L))
      if p >= s && p < e
    } yield (p, iid)).toSet
    for (width <- Seq(1L, 5L, 64L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === expect, s"bucketWidth=$width")
    }
  }

  test("shared or reserved column names are rejected up front") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("id", "p")
    intercept[IllegalArgumentException] { // `id` on both sides: ambiguous output
      RangeJoin.pointInInterval(points, Seq((1L, 0L, 9L)).toDF("id", "s", "e"),
        "p", "s", "e", bucketWidth = 8L)
    }
    intercept[IllegalArgumentException] { // `_bucket` is the internal key
      RangeJoin.pointInInterval(points.withColumnRenamed("id", "_bucket"),
        Seq((1L, 0L, 9L)).toDF("iid", "s", "e"), "p", "s", "e", bucketWidth = 8L)
    }
  }

  test("q40 plan is a broadcast equi-join, never a nested loop") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q40_range_join")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a broadcast equi-join on the bucket in:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
        s"range join must not fall back to a nested loop:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
