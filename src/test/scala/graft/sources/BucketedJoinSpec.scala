package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the co-located-join strategy the scale notes promise: two
  * tables bucketed on the join key join WITHOUT a shuffle (no
  * ShuffleExchange in the executed plan), while the same join on
  * plain tables shuffles both sides. At 100 TB this is the difference
  * between re-shuffling the corpus per join and a zero-exchange
  * sort-merge over co-located buckets. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without exchanges; plain tables shuffle") {
    import spark.implicits._
    val n = 10000
    val docs = spark.range(0, n)
      .select(col("id").as("doc_id"), (col("id") % 7).as("label"))
    val embs = spark.range(0, n)
      .select(col("id").as("vec_id"), (col("id") * 3 % 11).as("bucketed_norm"))

    spark.sql("DROP TABLE IF EXISTS graft_bjs_docs")
    spark.sql("DROP TABLE IF EXISTS graft_bjs_embs")
    try {
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("graft_bjs_docs")
      embs.write.bucketBy(8, "vec_id").sortBy("vec_id")
        .mode("overwrite").saveAsTable("graft_bjs_embs")

      // broadcast would hide the point at this size — force SMJ; AQE
      // off so ShuffleExchange nodes are visible to plan collect
      // (AdaptiveSparkPlanExec hides its inner plan from collect)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val bucketed = spark.table("graft_bjs_docs")
          .join(spark.table("graft_bjs_embs"),
            col("doc_id") === col("vec_id"))
        val shuffles = bucketed.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"bucketed join must not shuffle, found: $shuffles")
        assert(bucketed.count() === n)

        val plain = docs.join(embs, col("doc_id") === col("vec_id"))
        val plainShuffles = plain.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        assert(plainShuffles.nonEmpty,
          "control: the un-bucketed join should shuffle")
        assert(plain.count() === n)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bjs_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bjs_embs")
    }
  }
}
