package graft.queries

import graft.{SparkEntry, SparkSpec}

/** p33/p34/p35/p43 — vocabulary build, n-gram LM hit rate, tf-idf top
  * terms, KMV cardinality sketch. Pins (a) the scale claims: p33's
  * global top-K plans as TakeOrderedAndProject (local per-partition
  * heaps, no global sort), p35's and p43's rank filters pre-limit per
  * partition below the exchange (WindowGroupLimit Partial, like p26);
  * (b) the arithmetic on a hand-checkable recomputation at sf0.001
  * (the sf-corpus hash compare is the driver's job; these make
  * failures debuggable locally). */
class VocabOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def corpus: Array[(Long, Array[String])] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => (id, toks(t)) }
  }

  test("p33 plans the global top-K as TakeOrderedAndProject") {
    val df = SparkEntry.queries("p33_vocab_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("p35 rank filter pre-limits per partition before the exchange") {
    val df = SparkEntry.queries("p35_tfidf_topterms")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a partial (pre-shuffle) group limit in:\n$plan")
  }

  test("p43 rank filter pre-limits per partition and the estimate is sane") {
    import spark.implicits._
    val df = SparkEntry.queries("p43_kmv_distinct")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a partial (pre-shuffle) group limit in:\n$plan")
    val rows = df.select("lang", "n_distinct", "est")
      .as[(String, Long, Option[Double])].collect()
    assert(rows.length === 5)
    rows.foreach { case (lang, exact, est) =>
      assert(est.isDefined, s"$lang has >= ${Pipeline.KmvK} distinct bigrams")
      // k=64 → ~13% relative error; deterministic data, so a loose
      // two-sided band is stable and still falsifies a broken estimator
      assert(est.get > exact * 0.6 && est.get < exact * 1.6,
        s"$lang estimate ${est.get} implausible vs exact $exact")
    }
  }

  test("p33 top-K matches a driver-side recomputation") {
    import spark.implicits._
    val freq = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    corpus.foreach { case (_, ts) =>
      ts.groupBy(identity).foreach { case (t, occ) =>
        val (tf, df) = freq.getOrElse(t, (0L, 0L))
        freq.update(t, (tf + occ.length, df + 1))
      }
    }
    val expected = freq.toVector
      .sortBy { case (t, (tf, _)) => (-tf, t) }
      .take(20)
      .zipWithIndex
      .map { case ((t, (tf, df)), i) => (t, tf, df, (i + 1).toLong) }
    val got = SparkEntry.queries("p33_vocab_topk")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._4).toVector
    assert(got === expected)
  }

  test("p34 hit rate matches a driver-side recomputation") {
    import spark.implicits._
    val bigramsOf = (ts: Array[String]) => ts.sliding(2)
      .filter(_.length == 2).map(p => p(0) + " " + p(1)).toVector
    val docBigrams = corpus.map { case (id, ts) => (id, bigramsOf(ts)) }
    val lmDf = math.max(2L, corpus.length * 6L / 100L)
    val model = docBigrams.flatMap(_._2.distinct).groupBy(identity)
      .collect { case (sh, hits) if hits.length >= lmDf => sh }.toSet
    val expected = docBigrams.map { case (id, bgs) =>
      val hits = bgs.count(model)
      val permille = if (bgs.nonEmpty) hits * 1000L / bgs.length else 0L
      (id, bgs.length.toLong, hits.toLong, permille)
    }.sortBy(_._1).toVector
    val got = SparkEntry.queries("p34_lm_hit_rate")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toVector
    assert(got === expected)
    // both score classes populated, else the gate is vacuous
    assert(expected.exists(_._4 > 500) && expected.exists(_._4 < 500))
  }

  test("p35 per-doc terms match a driver-side recomputation") {
    import spark.implicits._
    val tf = corpus.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, occ) => (id, t, occ.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.length.toLong }
    val expected = tf.groupBy(_._1).toVector.flatMap { case (id, rows) =>
      rows.toVector
        .map { case (_, t, f) => (t, f, df(t)) }
        .sortBy { case (t, f, d) => (-f.toDouble / d, t) }
        .take(3)
        .zipWithIndex
        .map { case ((t, f, d), i) =>
          (id, t, f, d, f * 1000000L / d, (i + 1).toLong)
        }
    }.sortBy(r => (r._1, r._6))
    val got = SparkEntry.queries("p35_tfidf_topterms")(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._6)).toVector
    assert(got === expected)
  }
}
