package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** p31 — the two-phase prefix scan must produce exactly what the
  * simple (but unscalable) per-language window produces; also pins
  * the slice arithmetic on the sequence boundaries. */
class PackSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two-phase packing offsets equal the per-language window") {
    val got = SparkEntry.queries("p31_pack_sequences")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = Tables.documents(spark, sf)
      .withColumn("n_tokens",
        expr(s"CAST(size(${Pipeline.toksExpr}) AS BIGINT)"))
      .filter(col("n_tokens") > 0)
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("tok_offset"))
      .collect().map { r =>
        val off = r.getLong(3); val n = r.getLong(2)
        (r.getLong(0), (r.getString(1), n, off, off / Pipeline.PackSeqLen, (off + n - 1) / Pipeline.PackSeqLen))
      }.toMap

    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("offsets survive a downstream coalesce(1)") {
    // The verify harness writes through coalesce(1), which collapses
    // the narrow chain into one task — partition identity must come
    // from the rows (frozen at checkpoint), not from TaskContext.
    val direct = SparkEntry.queries("p31_pack_sequences")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val coalesced = SparkEntry.queries("p31_pack_sequences")(spark, sf)
      .coalesce(1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(coalesced === direct)
  }

  test("p32 rank-selection deciles equal a window-based computation") {
    val got = SparkEntry.queries("p32_length_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val base = Tables.documents(spark, sf)
      .withColumn("n_tokens",
        expr(s"CAST(size(${Pipeline.toksExpr}) AS BIGINT)"))
    val w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    val byRank = base.withColumn("rk", row_number().over(w))
      .select("lang", "rk", "n_tokens").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    val counts = base.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val expected = (for {
      (lang, n) <- counts.toSeq
      q <- 1L to 10L
    } yield (lang, q) -> (byRank((lang, (n * q + 9L) / 10L)), n)).toMap

    assert(got === expected)
  }

  test("p32 deciles survive a downstream coalesce(1)") {
    val direct = SparkEntry.queries("p32_length_quantiles")(spark, sf)
      .collect().map(_.toSeq).toSet
    val coalesced = SparkEntry.queries("p32_length_quantiles")(spark, sf)
      .coalesce(1).collect().map(_.toSeq).toSet
    assert(coalesced === direct)
  }

  test("sequence bounds partition the token stream without gaps") {
    val rows = SparkEntry.queries("p31_pack_sequences")(spark, sf)
      .orderBy("lang", "doc_id").collect()
    rows.groupBy(_.getString(1)).foreach { case (_, docs) =>
      var expectOffset = 0L
      docs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) === expectOffset) // contiguous concatenation
        assert(r.getLong(4) === r.getLong(3) / Pipeline.PackSeqLen)
        assert(r.getLong(5) === (r.getLong(3) + r.getLong(2) - 1) / Pipeline.PackSeqLen)
        expectOffset += r.getLong(2)
      }
    }
  }
}
