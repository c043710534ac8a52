package graft.operators

import graft.SparkSpec

/** Pins the large-star/small-star contraction: hand-checkable shapes
  * (chains are the adversarial case for propagation-style algorithms)
  * plus a pseudo-random graph cross-checked against a driver-side
  * union-find. */
class ConnectedComponentsSpec extends SparkSpec {

  /** Runs BOTH execution paths — the driver-side union-find finisher
    * (default threshold) and the distributed star-contraction loop
    * (threshold 0) — asserts they agree, and returns the labels. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val local = ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents
      .run(edges.toDF("src", "dst"), localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist, "local union-find and star contraction disagree")
    local
  }

  test("a chain collapses to its minimum id") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("two components; duplicates, self-loops and reversed edges collapse") {
    val lab = run(Seq((2L, 1L), (1L, 2L), (2L, 2L), (7L, 9L), (9L, 8L)))
    assert(lab === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("empty edge set yields no labels") {
    assert(run(Seq.empty) === Map.empty)
  }

  test("matches a union-find on a pseudo-random graph") {
    // Deterministic LCG (same constants as java.util.SplittableRandom's
    // mix input) so the case is reproducible.
    var x = 12345L
    def nxt(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) % 60
    }
    val edges = Vector.fill(80)((nxt(), nxt())).filter(e => e._1 != e._2)

    // Union by min: the surviving root of every merge is the smaller
    // root, so each final root IS its component's minimum.
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      val p = parent.getOrElse(a, a)
      if (p == a) a
      else { val r = find(p); parent(a) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    assert(run(edges) === expected)
  }
}
