package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join — Spark plans a raw
  * `p >= start AND p < end` theta join as a nested-loop over the full
  * cross product, which is the textbook scale killer. This operator
  * composes the standard fix from built-ins: quantize time into
  * fixed-width buckets, explode each interval into the buckets it
  * covers (ceil(span/width) rows — bounded when spans are bounded),
  * then EQUI-join points to interval-buckets and post-filter exact
  * containment. The pair set is bucket-local, never the cross
  * product.
  *
  * Scale regimes: a small interval set broadcasts (zero shuffle, the
  * q40 shape); a large one hash-partitions both sides on `_bucket` —
  * still an equi-join, so Catalyst picks SMJ/BHJ, never a
  * nested-loop. Point and bound columns must be non-negative longs on
  * the same scale (e.g. epoch micros); intervals are half-open
  * `[start, end)` and empty ones are dropped.
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long, broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // the output keeps every column of both inputs and the
    // containment filter is unqualified, so shared names would make
    // the join ambiguous (or silently resolve to the wrong side) —
    // assert the precondition instead of failing later in analysis
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must have disjoint columns; shared: ${shared.mkString(", ")}")
    require(!points.columns.contains("_bucket") && !intervals.columns.contains("_bucket"),
      "`_bucket` is reserved for the internal bucket key — rename it first")
    val exploded = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(expr(
        s"sequence(`$startCol` DIV $bucketWidth, (`$endCol` - 1) DIV $bucketWidth)")))
    val build = if (broadcastIntervals) broadcast(exploded) else exploded
    points
      .withColumn("_bucket", expr(s"`$pointCol` DIV $bucketWidth"))
      .join(build, "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
