package graft.queries

import graft.SparkSpec

/** p62 variable-length maximal-repeat mining: a brute-force re-scan of
  * the corpus verifies every reported row — occurrence count, doc
  * count, left-maximality, and dyadic maximality (no row's window can
  * be doubled into a repeated window at every occurrence) — facts the
  * oracle hash compare states only through the same prefix-doubling
  * algebra, here restated by direct substring counting.
  */
class RepeatMiningSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val toks: Map[Long, Array[String]] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .toMap

  /** count of occurrences of each window of width `len`, as
    * (window-text, doc_id, pos) plus a corpus-wide count map */
  private def windows(len: Int): Seq[(String, Long, Int)] =
    toks.toSeq.flatMap { case (doc, tk) =>
      (0 to tk.length - len).map(p => (tk.slice(p, p + len).mkString(" "), doc, p + 1))
    }

  private lazy val rows =
    graft.SparkEntry.queries("p62_repeat_mining")(spark, d).collect()

  test("p62 at-scale path (no localCheckpoint) matches the pinned path") {
    // Above repCheckpointMaxDocs the plan must run without executor-
    // block materialization (cluster safety — VERDICT r9 #5). Force
    // that path via the test hook and pin it to the default answer.
    val prop = "graft.p62.checkpoint.maxdocs"
    System.setProperty(prop, "0")
    try {
      val unpinned = graft.SparkEntry.queries("p62_repeat_mining")(spark, d).collect()
      assert(unpinned.length == rows.length)
      assert(unpinned.map(_.toString).sorted.sameElements(rows.map(_.toString).sorted))
    } finally System.clearProperty(prop)
  }

  test("p62 reports repeats at more than one length") {
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rep_len")).distinct.length >= 2)
  }

  test("p62 rows are exact, counted, left-maximal, and dyadically maximal") {
    val counts = collection.mutable.Map.empty[Int, Map[String, Seq[(String, Long, Int)]]]
    def occs(len: Int) = counts.getOrElseUpdate(len, windows(len).groupBy(_._1))
    rows.foreach { r =>
      val len = r.getAs[Long]("rep_len").toInt
      val text = r.getAs[String]("repeat_text")
      val sampleDoc = r.getAs[Long]("sample_doc")
      val samplePos = r.getAs[Long]("sample_pos").toInt
      // the sample points at a real occurrence of exactly this text
      assert(text.split(" ").length == len)
      assert(toks(sampleDoc).slice(samplePos - 1, samplePos - 1 + len)
        .mkString(" ") == text)
      val occ = occs(len)(text)
      assert(occ.length.toLong == r.getAs[Long]("n_occ"))
      assert(occ.map(_._2).distinct.length.toLong == r.getAs[Long]("n_docs"))
      // the sample is the minimum-gid occurrence
      val minGid = occ.map(o => o._2 * 1024L + o._3).min
      assert(minGid == sampleDoc * 1024L + samplePos)
      // left-maximal: >= 2 distinct left contexts, or only doc starts
      val lefts = occ.map { case (_, doc, p) =>
        if (p == 1) "^" else toks(doc)(p - 2) }.distinct
      assert(lefts.length.toLong == r.getAs[Long]("n_left_ctx"))
      assert(lefts.length >= 2 || lefts == Seq("^"))
      // dyadic maximality: some occurrence extends to a repeated
      // 2*len window neither to the right nor to the left
      if (len < 64) {
        val up = occs(2 * len)
        def repeated(doc: Long, p: Int): Boolean = {
          val tk = toks(doc)
          p >= 1 && p - 1 + 2 * len <= tk.length &&
            up(tk.slice(p - 1, p - 1 + 2 * len).mkString(" ")).length >= 2
        }
        assert(occ.exists { case (_, doc, p) =>
          !repeated(doc, p) && !repeated(doc, p - len) })
      }
    }
  }

  test("p62 plan: top-k via TakeOrderedAndProject, no cartesian/BNLJ") {
    val plan = graft.SparkEntry.queries("p62_repeat_mining")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Cartesian"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
