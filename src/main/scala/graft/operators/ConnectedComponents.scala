package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list via
  * alternating large-star / small-star rounds (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * label-contraction algorithm dedup clustering runs at corpus scale,
  * converging in O(log n) rounds independent of component diameter.
  *
  * Scale shape: each round is two hash-partitioned groupBy-min +
  * equi-join passes over the CURRENT edge set; edges only contract
  * toward star graphs (the set never grows beyond the symmetrized
  * input), no component is ever materialized on a single executor,
  * and nothing is all-pairs. Per-round `localCheckpoint()` truncates
  * the iterative lineage so round N's plan does not replay rounds
  * 1..N-1 — the standard fix for iterative DataFrame algorithms.
  * A naive "propagate min label to neighbors until quiet" loop needs
  * O(diameter) rounds, which for chain-shaped near-dup clusters
  * (doc → revision → revision …) is unbounded; star contraction is
  * why this formulation is the published MapReduce answer.
  *
  * Fixed point is detected with two cheap aggregates per round
  * (count + order-insensitive sum of xxhash64(src,dst)) instead of a
  * double anti-join `except()`.
  */
object ConnectedComponents {

  /** Map every vertex of the undirected graph `edges` (columns
    * `src`, `dst`, any integral type — labels come back as int64) to
    * its component's minimum vertex id. Returns `(id, comp_id)`, one
    * row per distinct vertex.
    *
    * When the canonicalized edge set is at most `localThreshold`
    * rows, the closure finishes with a driver-side union-find over
    * the collected edges instead of the distributed loop — the
    * standard last-mile shortcut for iterative graph algorithms
    * (per-round scheduling overhead dominates once the edge set is
    * driver-sized; Kiveris et al. §6 finish small graphs locally for
    * the same reason). The default threshold is 1M edges: with the
    * boxed HashMap/TreeSet bookkeeping below, driver heap cost is
    * roughly 100-150 B per edge/vertex (~150-300 MB worst case at the
    * threshold — measurably safe even on modest drivers; raw pairs
    * alone would be 16 MB, so the boxing dominates by ~10x and is
    * what the threshold must be sized to). At 100 TB the near-dup
    * graph exceeds it and takes the star-contraction loop, whose
    * per-round cost is what actually scales. Both paths produce
    * identical labels (pinned by ConnectedComponentsSpec, which runs
    * every case through each path). */
  def run(edges: DataFrame, maxRounds: Int = 30,
      localThreshold: Long = 1L << 20): DataFrame = {
    // Orient src > dst, drop self-loops and duplicates.
    val canon = edges
      .select(greatest(col("src"), col("dst")).cast("long").as("src"),
        least(col("src"), col("dst")).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // large-star: for each vertex u (over symmetrized edges) with
    // neighborhood N(u) and m = min(N(u) ∪ {u}), connect every
    // STRICTLY LARGER neighbor to m. Output stays src > dst.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      sym.join(mins, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    // small-star: edges arrive oriented src > dst; for each u with
    // smaller-neighborhood N = {v : (u,v)} and m = min(N), connect u
    // and every other member of N to m.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("src").agg(min("dst").as("m"))
      val viaNeighbors = e.join(mins, "src")
        .where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val viaCenter = mins.select(col("src"), col("m").as("dst"))
      viaNeighbors.unionByName(viaCenter).distinct()
    }

    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: xxhash64 values span the full int64 range, so
      // a sum would overflow under ANSI mode; xor is order-insensitive
      // and wrap-free (edge sets are distinct rows by construction).
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var cur = canon.localCheckpoint()
    var curSig = signature(cur)
    if (curSig._1 <= localThreshold && curSig._1 > 0L)
      return localFinish(cur)
    var converged = curSig._1 == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == curSig
      cur = next
      curSig = nextSig
      round += 1
    }
    require(converged,
      s"connected components did not converge in $maxRounds rounds")

    // Converged edge set is a union of stars (child, root): labels are
    // the star edges plus each root labeling itself.
    cur.select(col("src").as("id"), col("dst").as("comp_id"))
      .unionByName(cur.select(col("dst").as("id"), col("dst").as("comp_id")))
      .distinct()
  }

  /** Driver-side closure over a collected edge set: union-find with
    * union-by-min, so every root is its component's minimum id —
    * the same labeling the star contraction converges to. */
  private def localFinish(canonEdges: DataFrame): DataFrame = {
    val s = canonEdges.sparkSession
    import s.implicits._
    val pairs = canonEdges.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]
    def find(a: Long): Long = {
      var r = a
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = a // path compression
      while (parent.getOrDefault(c, c) != c) {
        val n = parent.get(c); parent.put(c, r); c = n
      }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val verts = new java.util.TreeSet[java.lang.Long]
    pairs.foreach { case (a, b) => verts.add(a); verts.add(b) }
    val labels = new Array[(Long, Long)](verts.size)
    var i = 0
    verts.forEach { v => labels(i) = (v.longValue, find(v.longValue)); i += 1 }
    s.createDataset(labels.toIndexedSeq).toDF("id", "comp_id")
  }
}
