package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Makes the ANN quality claims falsifiable instead of comment-only:
  * measures p09's cross-polytope LSH pair recall against brute-force
  * ground truth (every pair with cosine >= 0.35, computed driver-side
  * over the collected sf0.001 vectors — 500 × 500 × 64 mults) and
  * asserts a floor below the measured point so a silent regression in
  * the projection kernel, bucketing or probing fails the suite. */
class AnnRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.35

  test("p09 LSH pair recall at cos >= 0.35 stays above the floor") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val ids = vecs.map(_._1)
    val vs = vecs.map(_._2)
    val norms = vs.map(v => math.sqrt(v.map(x => x * x).sum))
    val truth = scala.collection.mutable.Set.empty[(Long, Long)]
    var i = 0
    while (i < vs.length) {
      var j = i + 1
      while (j < vs.length) {
        var dot = 0.0
        var k = 0
        val n = math.min(vs(i).length, vs(j).length)
        while (k < n) { dot += vs(i)(k) * vs(j)(k); k += 1 }
        if (dot / (norms(i) * norms(j)) >= Tau) truth += ((ids(i), ids(j)))
        j += 1
      }
      i += 1
    }
    val got = SparkEntry.queries("p09_ann_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth empty — corpus or tau changed")
    val hits = got.count(truth.contains)
    val recall = hits.toDouble / truth.size
    info(f"p09 recall=$recall%.3f (${hits}/${truth.size} true pairs found)")
    // measured 0.665 at sf0.001 / 0.77 at sf0.1; floor leaves headroom
    // for corpus regeneration, not for algorithmic regression
    assert(recall >= 0.55, f"recall $recall%.3f below floor")
    // precision sanity: every emitted pair is exact-cosine verified,
    // so no emitted pair may be a false positive
    val falsePos = got.filterNot(truth.contains)
    assert(falsePos.isEmpty, s"verified pairs outside ground truth: $falsePos")
  }

  test("p15 IVF recall@5 over the probed cells stays above the floor") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val ids = vecs.map(_._1)
    val vs = vecs.map(_._2)
    val norms = vs.map(v => math.sqrt(v.map(x => x * x).sum))
    // exact top-5 neighbors per query (qid < 20), p15's tiebreak order
    val truth: Map[Long, Set[Long]] = (0 until vs.length)
      .filter(ids(_) < 20).map { qi =>
        val scored = (0 until vs.length).filter(_ != qi).map { ni =>
          var dot = 0.0
          var k = 0
          val n = math.min(vs(qi).length, vs(ni).length)
          while (k < n) { dot += vs(qi)(k) * vs(ni)(k); k += 1 }
          val cos = dot / (norms(qi) * norms(ni))
          (math.rint(cos * 1e6) / 1e6, ids(ni))
        }.sortBy { case (c, nid) => (-c, nid) }.take(5).map(_._2).toSet
        ids(qi) -> scored
      }.toMap
    val got: Map[Long, Set[Long]] =
      SparkEntry.queries("p15_ann_ivf")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val overlaps = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
    }
    val recall = overlaps.sum / overlaps.size
    info(f"p15 recall@5=$recall%.3f over ${truth.size} queries")
    // measured 0.68 at sf0.001 on the isotropic worst-case corpus
    // (cells carry no cluster structure); floor guards the search
    // shape, not the unreachable exact answer
    assert(recall >= 0.45, f"recall@5 $recall%.3f below floor")
  }
}
