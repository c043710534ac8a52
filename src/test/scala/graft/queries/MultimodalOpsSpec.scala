package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.{SparkSpec, SparkEntry}

/** Pins the scale claim of the multimodal decode operators: p16/p18/
  * p23 are narrow synthesize→decode passes (typed mapPartitions over
  * the scan) whose executed plans contain NO shuffle exchange. p10 is
  * excluded: its metadata join legitimately exchanges. */
class MultimodalOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p16/p18/p23 plans contain no shuffle exchange") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (n <- Seq("p16_multimodal_features", "p18_multimodal_audio",
                    "p23_multimodal_video")) {
        val df = SparkEntry.queries(n)(spark, sf)
        val shuffles = df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty, s"$n must be a narrow decode pass, found: $shuffles")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("p23 output schema and row count match the corpus") {
    val df = SparkEntry.queries("p23_multimodal_video")(spark, sf)
    assert(df.columns.toSeq === Seq("doc_id", "width", "height", "fps_num",
      "fps_den", "n_frames", "duration_us", "sample_sum", "n_bytes"))
    val n = df.count()
    assert(n > 0 && n == spark.read.parquet(s"$sf/documents.parquet").count())
  }
}
