package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry}

/** The round-4 curation additions (p20/p21/p22/p25/p41/p42). Pins
  * (a) the scale claims: the per-row operators are zero-shuffle
  * projections, p26's top-K pre-limits below the exchange, p42's
  * batch/history probes stay all-broadcast; and (b) the per-row
  * arithmetic on hand-checkable vectors (the sf-corpus hash compare
  * is the driver's job; these rows make failures debuggable
  * locally). */
class CurationOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p20/p21/p22 plans contain no shuffle exchange") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (n <- Seq("p20_repetition_filter", "p21_pii_scrub", "p22_embed_quantize",
                    "p25_stratified_sample", "p41_leakage_split")) {
        val df = SparkEntry.queries(n)(spark, sf)
        val shuffles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty, s"$n must be a zero-shuffle projection, found: $shuffles")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("p41 splits are domain-disjoint and all three are populated") {
    import spark.implicits._
    val out = SparkEntry.queries("p41_leakage_split")(spark, sf)
      .select("source", "split").as[(String, String)].collect()
    out.groupBy(_._1).foreach { case (src, rows) =>
      val splits = rows.map(_._2).distinct
      assert(splits.length === 1, s"source $src straddles splits: ${splits.toSeq}")
    }
    assert(out.map(_._2).distinct.sorted.toSeq === Seq("test", "train", "val"))
  }

  test("p42 resolves manufactured dups to their historical canonical and broadcasts the probe") {
    import spark.implicits._
    // AQE off like every other plan pin: with AQE on, executedPlan
    // renders an Initial Plan section too, and a join the runtime
    // converts to broadcast could still print as SortMergeJoin there
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val df = SparkEntry.queries("p42_incremental_dedup")(spark, sf)
    val rows = df.select("doc_id", "is_novel", "dup_of")
      .as[(Long, Boolean, Option[Long])].collect().toSeq
    assert(rows.length === 50) // one row per batch doc (doc_id % 10 == 0)
    rows.foreach { case (id, novel, dupOf) =>
      if ((id / 10) % 2 == 0) {
        assert(!novel && dupOf.contains(id + 1),
          s"doc $id should be a dup of ${id + 1}, got novel=$novel dup_of=$dupOf")
      } else {
        assert(novel && dupOf.isEmpty, s"doc $id should be novel, got dup_of=$dupOf")
      }
    }
    // the scale claim: the batch hash set broadcasts into the history
    // scan (semi-join filter) and the hit set broadcasts back, so
    // history is never wide-shuffled — every join must be a broadcast
    // hash join, none may fall back to sort-merge
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast probe join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"history must not be wide-shuffled through a sort-merge join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("p26 rank filter pre-limits per partition before the exchange") {
    // the scale claim: WindowGroupLimit(Partial) must sit below the
    // shuffle so hot sources never ship more than partitions × K rows
    val df = SparkEntry.queries("p26_source_quota")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a partial (pre-shuffle) group limit in:\n$plan")
  }

  test("p20 run-length top_count matches a hand count") {
    // 'b b b a a c' → top_count 3; bigrams [b b, b b, b a, a a, a c]
    // → 5 total, 4 distinct
    import spark.implicits._
    val row = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val got = SparkEntry.queries("p20_repetition_filter")(spark, sf)
    // the QDef reads the sf dir, so recompute over a one-row frame with
    // the PRODUCTION expressions (shared constants, not pasted copies):
    val out = row.withColumn("toks", expr(Pipeline.toksExpr))
      .withColumn("top_count", expr(Pipeline.topCountExpr))
      .select("top_count").as[Long].head()
    assert(out === 3L)
    assert(got.columns.toSeq === Seq("doc_id", "n_tokens", "n_distinct",
      "top_count", "n_bigrams", "n_distinct_bigrams", "keep"))
  }

  test("p20 run-length top_count equals naive per-token max on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "dd", "e")
    val docsGen = (1 to 200).map { i =>
      val n = rnd.nextInt(30) // includes empty docs
      (i.toLong, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val expected = docsGen.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      id -> (if (toks.isEmpty) 0L
             else toks.groupBy(identity).values.map(_.length).max.toLong)
    }.toMap
    val got = docsGen.toDF("doc_id", "text")
      .withColumn("toks", expr(Pipeline.toksExpr))
      .withColumn("top_count", expr(Pipeline.topCountExpr))
      .select("doc_id", "top_count").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("p21 redacts every injected span and counts match") {
    import spark.implicits._
    val out = SparkEntry.queries("p21_pii_scrub")(spark, sf)
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        col("redacted"))
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val red = r.getString(4)
      assert(!red.contains("@example.com") && !red.contains("@corp.test.org"),
        s"unredacted email in doc ${r.getLong(0)}")
      assert(!red.contains("+1-555-"), s"unredacted phone in doc ${r.getLong(0)}")
      assert(!red.contains("10.0."), s"unredacted IP in doc ${r.getLong(0)}")
      val id = r.getLong(0)
      val expEmails = (if (id % 3 != 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(r.getLong(1) === expEmails.toLong, s"email count, doc $id")
      assert(r.getLong(2) === (if (id % 4 == 0) 1L else 0L), s"phone count, doc $id")
      assert(r.getLong(3) === (if (id % 7 == 0) 1L else 0L), s"ip count, doc $id")
      assert(red.contains("<EMAIL>") == (expEmails > 0))
    }
  }

  test("p22 quantized values span [-127, 127] and hit the extremes") {
    import spark.implicits._
    val out = SparkEntry.queries("p22_embed_quantize")(spark, sf)
    val qs = out.select("q_csv").as[String].collect()
      .map(_.split(',').map(_.toLong))
    assert(qs.nonEmpty)
    // symmetric int8 range, and by construction max|q| == 127 for every
    // vector (the max-|x| component maps to ±127 exactly)
    qs.foreach { q =>
      assert(q.forall(v => v >= -127 && v <= 127))
      assert(q.map(math.abs).max === 127L)
    }
    // l1 column is consistent with the csv
    val both = out.select("q_csv", "l1").as[(String, Long)].collect()
    both.foreach { case (csv, l1) =>
      assert(csv.split(',').map(v => math.abs(v.toLong)).sum === l1)
    }
  }
}
