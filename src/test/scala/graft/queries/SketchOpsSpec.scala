package graft.queries

import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Invariants of the sketch-based operators (p45 bloom-pruned
  * decontamination, p46 count-min heavy hitters) that the oracle hash
  * compare implies but doesn't state directly. */
class SketchOpsSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("p45 bloom prune never changes the decontamination answer") {
    // The defining property of prune+confirm: false positives are
    // filtered by the exact join, false negatives are impossible
    // (every true hit gram is bloom-positive by construction), so the
    // contaminated flag must equal p24's exact-join answer per doc.
    val exact = graft.SparkEntry.queries("p24_decontaminate")(spark, d)
      .select("doc_id", "contaminated")
    val bloom = graft.SparkEntry.queries("p45_bloom_decontaminate")(spark, d)
      .select("doc_id", "contaminated")
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
  }

  test("p45 candidate counts dominate hit counts and FPs are populated") {
    val rows = graft.SparkEntry.queries("p45_bloom_decontaminate")(spark, d)
      .select("n_cand_grams", "n_hit_grams").collect()
    assert(rows.forall(r => r.getLong(0) >= r.getLong(1)),
      "a hit gram escaped the bloom prune — false negative")
    assert(rows.exists(r => r.getLong(0) > r.getLong(1)),
      "no false positives at this filter load — the two-sided check is vacuous")
  }

  test("p45 bloom bit-test runs below every exchange, on the scan") {
    // AQE off like the other plan pins, so the tree is traversable
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = graft.SparkEntry.queries("p45_bloom_decontaminate")(spark, d)
        .queryExecution.executedPlan
      val pruneOnScan = plan.collect {
        case f: FilterExec if f.condition.toString.contains("shiftright") => f
      }.exists { f =>
        f.find(_.isInstanceOf[FileSourceScanExec]).isDefined &&
          f.find(_.isInstanceOf[ShuffleExchangeExec]).isEmpty
      }
      assert(pruneOnScan,
        s"bloom bit-test not scan-adjacent:\n${plan.toString.take(4000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("p46 CMS estimates dominate exact counts, strictly somewhere") {
    // est = min over rows of counters that each sum EVERY occurrence
    // of every colliding token, so est >= exact always (the CMS
    // guarantee); with w=16 on this vocabulary some bucket collides,
    // so at least one estimate must be a strict overestimate.
    val rows = graft.SparkEntry.queries("p46_cms_heavy_hitters")(spark, d)
      .select("est", "exact").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) >= r.getLong(1)),
      "an estimate fell below the exact count — a counter missed occurrences")
    assert(rows.exists(r => r.getLong(0) > r.getLong(1)),
      "no collisions at w=16 — the overestimate surface is vacuous")
  }
}
