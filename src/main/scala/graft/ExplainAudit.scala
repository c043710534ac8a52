package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("p02_dedup_minhash_lsh", "p09_ann_lsh", "p08_knn_brute",
        "p11_modality_join", "p13_dedup_ngram_jaccard", "p14_dedup_embed_cosine",
        "p15_ann_ivf", "p19_curation_funnel", "p24_decontaminate",
        "p27_bm25", "p30_dedup_connected", "p36_span_dedup",
        "p37_semantic_dedup", "p39_mixture_sample", "p42_incremental_dedup")) {
      println(s"==== $n")
      val df = SparkEntry.queries(n)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.take(120)).toSeq
      joins.foreach(println)
      println(s"  cartesian=${plan.contains("Cartesian")} bnlj=${plan.contains("BroadcastNestedLoop")}")
    }
    spark.stop()
  }
}
