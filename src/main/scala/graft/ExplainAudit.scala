package graft
import org.apache.spark.sql.SparkSession

/** Plan-shape gate over the join-bearing pipeline operators: prints the
  * join lines of every audited plan and exits nonzero if any plan
  * contains a cartesian product or an unexpected broadcast-nested-loop
  * stage, so a join-shape regression fails the run instead of relying
  * on a human reading the printout. p08's BNLJ is intentional — it IS
  * the broadcast brute-force k-NN baseline. */
object ExplainAudit {
  /** Operators whose plan legitimately contains a BNLJ stage. */
  private val allowBnlj = Set("p08_knn_brute",
    // single-row vocab broadcast (crossJoin of one collect_list row)
    "p55_wordpiece_tokenize")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    var bad = List.empty[String]
    for (n <- Seq("p02_dedup_minhash_lsh", "p09_ann_lsh", "p08_knn_brute",
        "p11_modality_join", "p13_dedup_ngram_jaccard", "p14_dedup_embed_cosine",
        "p15_ann_ivf", "p64_ann_ivfpq", "p19_curation_funnel", "p24_decontaminate",
        "p27_bm25", "p30_dedup_connected", "p36_span_dedup",
        "p37_semantic_dedup", "p39_mixture_sample", "p42_incremental_dedup",
        "p44_simhash_neardup", "p45_bloom_decontaminate", "p46_cms_heavy_hitters",
        "p47_hll_distinct", "p48_quantile_sample", "p49_source_overlap",
        "p50_substring_dedup", "p51_kmeans_cluster",
        "p55_wordpiece_tokenize", "p56_bpe_train", "p57_token_fertility",
        "p58_event_funnel", "p59_url_dedup", "p60_markov_transitions",
        "p61_paragraph_dedup", "p62_repeat_mining", "p65_fuzzy_entity_match",
        "q39_asof_join", "q40_range_join", "q43_subquery_exists")) {
      println(s"==== $n")
      val df = SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.take(120)).toSeq
      joins.foreach(println)
      val cartesian = plan.contains("Cartesian")
      val bnlj = plan.contains("BroadcastNestedLoop")
      println(s"  cartesian=$cartesian bnlj=$bnlj")
      if (cartesian || (bnlj && !allowBnlj(n))) bad ::= n
    }
    spark.stop()
    if (bad.nonEmpty) {
      System.err.println(s"[audit] FAIL: bad join shape in ${bad.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("[audit] all plans ok")
  }
}
