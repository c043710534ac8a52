package graft.queries

import graft.SparkSpec

/** Invariants of the round-5 event/web additions (p58 funnel, p59 URL
  * canonicalization dedup, p60 Markov transitions, p61 keep-first
  * paragraph dedup) that the oracle hash compare cannot state directly
  * — funnel monotonicity, probability-mass closure, conservation
  * totals, canonical-form syntax — plus their plan-shape pins.
  */
class EventOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.SparkEntry.queries(name)(spark, d)
      .queryExecution.executedPlan.toString

  test("p58 funnel stages are monotone and rates are consistent") {
    val r = graft.SparkEntry.queries("p58_event_funnel")(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    val nUsers = row.getAs[Long]("n_users")
    val s1 = row.getAs[Long]("stage_view")
    val s2 = row.getAs[Long]("stage_click")
    val s3 = row.getAs[Long]("stage_purchase")
    // each stage requires the previous one STRICTLY earlier, so the
    // reach counts can only shrink down the funnel
    assert(nUsers >= s1 && s1 >= s2 && s2 >= s3)
    // sf0.001 has 15 users over 1000 events — every user reaches every
    // stage at this density; the funnel is populated, not degenerate
    assert(s1 > 0 && s3 > 0)
    val convClick = row.getAs[Double]("conv_click")
    val convPurchase = row.getAs[Double]("conv_purchase")
    val convOverall = row.getAs[Double]("conv_overall")
    assert(convClick >= 0 && convClick <= 1)
    assert(convPurchase >= 0 && convPurchase <= 1)
    assert(math.abs(convOverall - convClick * convPurchase) < 1e-12)
    // conversions take time: the mean gap is strictly positive and no
    // larger than the whole event-time span
    val mean = row.getAs[Double]("mean_convert_s")
    assert(mean > 0 && mean < 366L * 24 * 3600)
  }

  test("p58 yields NULL rates (not Inf/NaN or a crash) on an empty funnel stage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a corpus where NO user ever purchases: the purchase denominators
    // hit zero. Spark's non-ANSI Divide gives NULL for x/0 on doubles
    // while DuckDB gives Inf/NaN, so both sides of p58 guard every
    // denominator with nullif — this pins the Spark half of that
    // contract on the formerly-latent input.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-p58-empty-stage").toString
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val rows = (1L to 6L).map { u =>
      (u * 10, new java.sql.Timestamp(base.getTime + u * 1000),
        u, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.SparkEntry.queries("p58_event_funnel")(spark, tmp).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("stage_view") === 6L)
    assert(row.getAs[Long]("stage_click") === 0L)
    assert(row.getAs[Long]("stage_purchase") === 0L)
    // zero NUMERATOR over a populated denominator stays 0.0 …
    assert(row.getAs[Double]("conv_click") === 0.0)
    assert(row.getAs[Double]("conv_overall") === 0.0)
    // … but zero-DENOMINATOR rates are NULL, never Infinity/NaN:
    // conv_purchase divides by stage_click = 0, mean_convert_s by
    // stage_purchase = 0 (and its numerator, a sum over no rows, is
    // itself NULL in both engines)
    assert(row.isNullAt(row.fieldIndex("conv_purchase")))
    assert(row.isNullAt(row.fieldIndex("total_convert_s")))
    assert(row.isNullAt(row.fieldIndex("mean_convert_s")))
  }

  test("p58 plan shuffles events once by user (plus the 1-row rollup)") {
    val plan = planOf("p58_event_funnel")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // one hash exchange for the user_id window/agg chain + the
    // SinglePartition exchange for the global rollup — a third hash
    // exchange would mean the window chain lost its co-partitioning
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("p60 transition mass sums to 1 per from-state and counts conserve") {
    val rows = graft.SparkEntry.queries("p60_markov_transitions")(spark, d).collect()
    assert(rows.nonEmpty)
    // sum(n) over all transitions = events - users (each user with k
    // events contributes exactly k-1 successor pairs)
    val totalN = rows.map(_.getAs[Long]("n")).sum
    assert(totalN == 1000 - 15)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, grp) =>
      val mass = grp.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-9)
      val grpTotal = grp.map(_.getAs[Long]("n")).sum
      grp.foreach { r =>
        assert(math.abs(r.getAs[Double]("p") -
          r.getAs[Long]("n").toDouble / grpTotal.toDouble) < 1e-15)
      }
    }
  }

  test("p59 canonical URLs are normalized and conserve the corpus") {
    val rows = graft.SparkEntry.queries("p59_url_dedup")(spark, d).collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == 500)
    // dedup is populated: canonical groups < docs, and some group
    // actually collapses raw variants
    assert(rows.length < 500)
    assert(rows.exists(_.getAs[Long]("n_docs") > 1))
    rows.foreach { r =>
      val u = r.getAs[String]("canon_url")
      // canonical form: no fragment, no default port, no tracking
      // params, lowercase de-www'd host, no trailing slash, sorted params
      assert(!u.contains("#") && !u.contains(":443") && !u.contains("WWW") &&
        !u.contains("utm") && !u.contains("ref="), u)
      assert(u.startsWith("https://example.com/"), u)
      assert(!u.endsWith("/"), u)
      val q = u.split("\\?", 2)
      if (q.length == 2) {
        val params = q(1).split("&").toSeq
        assert(params == params.sorted, u)
      }
      assert(r.getAs[Long]("n_raw_variants") <= r.getAs[Long]("n_docs"))
    }
  }

  test("p61 keeps each segment exactly once corpus-wide and conserves totals") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("p61_paragraph_dedup")(spark, d).collect()
    assert(rows.length == 500)
    val kept = rows.map(_.getAs[Long]("segs_kept")).sum
    val dropped = rows.map(_.getAs[Long]("segs_dropped")).sum
    // recompute the corpus segmentation independently: kept must equal
    // the DISTINCT segment count, kept+dropped the total segment count
    val segs = graft.Tables.documents(spark, d)
      .withColumn("toks", expr(Pipeline.toksExpr))
      .select(posexplode(expr(Pipeline.spanSegsExpr)).as(Seq("pos", "seg")))
    val total = segs.count()
    val distinct = segs.select("seg").distinct().count()
    assert(kept == distinct, s"kept=$kept distinct=$distinct")
    assert(kept + dropped == total, s"kept+dropped=${kept + dropped} total=$total")
    // dedup is populated on this corpus
    assert(dropped > 0)
    // a doc's kept_text word count is 3*segs_kept at most (ragged tail)
    rows.foreach { r =>
      val nWords = r.getAs[String]("kept_text").split(" ").count(_.nonEmpty)
      assert(nWords <= 3 * r.getAs[Long]("segs_kept"))
    }
  }

  test("p59/p60/p61 plans have no cartesian or nested-loop stage") {
    for (q <- Seq("p59_url_dedup", "p60_markov_transitions", "p61_paragraph_dedup")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), q)
      assert(!plan.contains("BroadcastNestedLoopJoin"), q)
      assert(!plan.contains("SortMergeJoin"), q) // all three are join-free
    }
  }
}
