package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape gate over the join-bearing pipeline operators: prints the
  * join lines of every audited plan and exits nonzero if any plan
  * contains a cartesian product, an unexpected broadcast-nested-loop
  * stage, or MORE EXCHANGES than its pinned budget, so a join-shape or
  * shuffle-count regression fails the run instead of relying on a
  * human reading the printout. p08's BNLJ is intentional — it IS the
  * broadcast brute-force k-NN baseline.
  *
  * Exchange budgets (round 12, VERDICT r11 #8): the cartesian/BNLJ
  * check cannot see the class of regression p44's pre-rework DISTINCT
  * exchange was — an extra shuffle in an otherwise-legal plan. Each
  * audited operator pins the (shuffle, broadcast) exchange counts of
  * its current plan at sf0.01; growth fails the audit, shrinkage
  * prints a reminder to re-pin. Counts come from the pre-execution
  * plan string (`\bExchange\b` does not match inside
  * `BroadcastExchange` — word boundary), the same text the join check
  * reads. Re-pin deliberately when a plan change is intentional:
  * SPARK_GRAFT_AUDIT_PRINT=1 prints the observed counts as a
  * paste-ready map. */
object ExplainAudit {
  /** Operators whose plan legitimately contains a BNLJ stage. */
  private val allowBnlj = Set("p08_knn_brute",
    // single-row vocab broadcast (crossJoin of one collect_list row)
    "p55_wordpiece_tokenize")

  /** (shuffle exchanges, broadcast exchanges) pinned per audited
    * operator from the round-12 plans at sf0.01. */
  private val exchangeBudget: Map[String, (Int, Int)] = Map(
    "p02_dedup_minhash_lsh" -> (9, 2),
    "p09_ann_lsh" -> (4, 1),
    "p08_knn_brute" -> (0, 1),
    "p11_modality_join" -> (0, 1),
    "p13_dedup_ngram_jaccard" -> (8, 3),
    "p14_dedup_embed_cosine" -> (5, 2),
    "p15_ann_ivf" -> (4, 1),
    "p64_ann_ivfpq" -> (5, 2),
    "p19_curation_funnel" -> (1, 1),
    "p24_decontaminate" -> (4, 0),
    "p27_bm25" -> (6, 2),
    "p30_dedup_connected" -> (2, 0),
    "p36_span_dedup" -> (7, 2),
    "p37_semantic_dedup" -> (7, 4),
    "p39_mixture_sample" -> (3, 1),
    "p42_incremental_dedup" -> (0, 3),
    "p44_simhash_neardup" -> (6, 2),
    "p45_bloom_decontaminate" -> (4, 1),
    "p46_cms_heavy_hitters" -> (3, 1),
    "p47_hll_distinct" -> (2, 0),
    "p48_quantile_sample" -> (3, 1),
    "p49_source_overlap" -> (4, 1),
    "p50_substring_dedup" -> (8, 2),
    "p51_kmeans_cluster" -> (1, 0),
    "p55_wordpiece_tokenize" -> (3, 0),
    "p56_bpe_train" -> (4, 1),
    "p57_token_fertility" -> (4, 1),
    "p58_event_funnel" -> (2, 0),
    "p59_url_dedup" -> (3, 0),
    "p60_markov_transitions" -> (2, 0),
    "p61_paragraph_dedup" -> (5, 1),
    "p62_repeat_mining" -> (4, 1),
    "p65_fuzzy_entity_match" -> (9, 3),
    "q39_asof_join" -> (1, 0),
    "q40_range_join" -> (0, 1),
    "q43_subquery_exists" -> (2, 1))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val printPins = sys.env.get("SPARK_GRAFT_AUDIT_PRINT").contains("1")
    var bad = List.empty[String]
    val observed = scala.collection.mutable.LinkedHashMap[String, (Int, Int)]()
    for (n <- exchangeBudget.keys.toSeq.sorted) {
      println(s"==== $n")
      val df = SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.take(120)).toSeq
      joins.foreach(println)
      val cartesian = plan.contains("Cartesian")
      val bnlj = plan.contains("BroadcastNestedLoop")
      val shuffles = "\\bExchange\\b".r.findAllIn(plan).size
      val bcasts = "\\bBroadcastExchange\\b".r.findAllIn(plan).size
      observed(n) = (shuffles, bcasts)
      val (bs, bb) = exchangeBudget(n)
      println(s"  cartesian=$cartesian bnlj=$bnlj exchanges=$shuffles/$bs broadcast=$bcasts/$bb")
      if (cartesian || (bnlj && !allowBnlj(n))) bad ::= n
      else if (shuffles > bs || bcasts > bb) {
        System.err.println(s"[audit] $n exchange count grew: " +
          s"shuffle $shuffles (budget $bs), broadcast $bcasts (budget $bb)")
        bad ::= n
      } else if (shuffles < bs || bcasts < bb)
        println(s"  NOTE: $n now cheaper than its budget — re-pin to ($shuffles, $bcasts)")
    }
    if (printPins) {
      println("  // paste-ready exchangeBudget pins:")
      observed.foreach { case (n, (s2, b2)) => println(s"""    "$n" -> ($s2, $b2),""") }
    }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[audit] FAIL: bad join shape or exchange growth in ${bad.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("[audit] all plans ok")
  }
}
