package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q44 PIVOT — pins `total` as a TRUE row count. The crosstab lists
  * five explicit lang columns; before round 7 `total` was their sum,
  * which silently undercounts the moment a sixth lang (or a NULL
  * lang) enters the corpus while the oracle's count(*) keeps growing
  * — a guaranteed future hash mismatch. The formerly-latent input is
  * pinned here with a synthetic corpus containing both.
  */
class PivotSpec extends SparkSpec {

  test("q44 total is count(*), robust to langs outside the pivot list") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-q44-sixth-lang").toString
    val rows = Seq(
      (1L, "t", "en", "web", 1L), (2L, "t", "en", "web", 1L),
      (3L, "t", "de", "web", 1L), (4L, "t", "ja", "web", 1L),
      (5L, "t", null, "web", 1L), (6L, "t", "zh", "book", 1L),
      (7L, "t", "ja", "book", 1L), (8L, "t", "fr", "book", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.SparkEntry.queries("q44_pivot")(spark, tmp)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got.keySet === Set("web", "book"))
    val web = got("web")
    assert(web.getAs[Long]("en") === 2L)
    assert(web.getAs[Long]("de") === 1L)
    assert(web.getAs[Long]("zh") === 0L)
    // 'ja' and NULL langs are invisible as columns but MUST count:
    // web has 5 rows though only 3 fall in the explicit lang list
    assert(web.getAs[Long]("total") === 5L)
    val book = got("book")
    assert(book.getAs[Long]("zh") === 1L)
    assert(book.getAs[Long]("fr") === 1L)
    assert(book.getAs[Long]("total") === 3L)
    // the reshaped output exposes exactly the five listed columns + total
    assert(graft.SparkEntry.queries("q44_pivot")(spark, tmp).columns.toSeq
      === Seq("source", "de", "en", "es", "fr", "zh", "total"))
  }

  test("q44 stays a single-pass hash aggregation (no second exchange)") {
    val plan = graft.SparkEntry.queries("q44_pivot")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // Spark's explicit-value pivot is the two-phase aggregate
    // (source,lang) count → pivotfirst over source: exactly two hash
    // exchanges, same shape as before the 'other' bucket — the extra
    // bucket is one more conditional count, not a third pass or a join
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges === 2, s"expected 2 hash exchanges, plan:\n$plan")
    assert(!plan.contains("Join"), s"pivot must not join:\n$plan")
  }
}
