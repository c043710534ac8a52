package graft.queries

import graft.{SparkEntry, SparkSpec}

/** p55/p56 — WordPiece greedy inference and BPE merge training. The
  * sf-corpus hash compare against DuckDB is the driver's job; these
  * pin each operator against a THIRD formulation — a plain-Scala
  * reference implementation computed inside the test — so a
  * divergence localizes to the Spark query rather than to "one of the
  * two engines". Exact equality on every word/doc, not just totals. */
class TokenizerOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Vector[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector

  private def corpus: Array[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
  }

  test("p56 matches a plain-Scala reference BPE trainer word for word") {
    import spark.implicits._
    val wc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    corpus.foreach { case (_, t) =>
      toks(t).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    }
    var words: Map[String, (Long, Vector[String])] =
      wc.toMap.map { case (w, c) => w -> (c, w.map(_.toString).toVector) }
    for (_ <- 1 to 8) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.values.foreach { case (c, ts) =>
        ts.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), _) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        words = words.map { case (w, (c, ts)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ts.size) {
            if (i + 1 < ts.size && ts(i) == a && ts(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += ts(i); i += 1 }
          }
          w -> (c, out.result())
        }
      }
    }
    val got = SparkEntry.queries("p56_bpe_train")(spark, sf)
      .select("w", "cnt", "pieces", "n_pieces")
      .as[(String, Long, String, Long)].collect()
    assert(got.length === words.size)
    got.foreach { case (w, c, pieces, np) =>
      val (refC, refT) = words(w)
      assert(c === refC, s"count for $w")
      assert(pieces === refT.mkString(" "), s"segmentation for $w")
      assert(np === refT.size.toLong, s"piece count for $w")
    }
    // the corpus must actually exercise a second-order merge (a merge
    // whose operand is itself a merged piece), or K rounds degenerate
    // to independent char-pair picks any broken sequencing would pass
    assert(words.values.exists(_._2.exists(_.length >= 3)),
      "expected at least one piece of length >= 3 (merge of a merge)")
  }

  test("p57 fertility matches the reference trainer and broadcasts the vocab") {
    import spark.implicits._
    // reference: same trainer as the p56 test, then per-lang totals
    val wc = scala.collection.mutable.Map.empty[String, Long]
    corpus.foreach { case (_, t) =>
      toks(t).foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    }
    var words: Map[String, Vector[String]] =
      wc.toMap.map { case (w, _) => w -> w.map(_.toString).toVector }
    for (_ <- 1 to 8) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, ts) =>
        ts.sliding(2).filter(_.size == 2).foreach { p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + wc(w)
        }
      }
      if (pc.nonEmpty) {
        val ((a, b), _) = pc.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        words = words.map { case (w, ts) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ts.size) {
            if (i + 1 < ts.size && ts(i) == a && ts(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += ts(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    val docsByLang = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").as[(String, String)].collect()
    val expected = docsByLang.groupBy(_._1).map { case (lang, rows) =>
      val ws = rows.toVector.flatMap(r => toks(r._2))
      val pieces = ws.map(w => words(w).size.toLong).sum
      lang -> ((ws.size.toLong, pieces, ws.map(_.length.toLong).sum))
    }
    val df = SparkEntry.queries("p57_token_fertility")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the vocab join to broadcast in:\n$plan")
    val got = df.select("lang", "total_words", "total_pieces", "total_chars")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === expected.size)
    got.foreach { case (lang, tw, tp, tc) =>
      assert((tw, tp, tc) === expected(lang), s"lang $lang")
    }
  }

  test("p55 matches a plain-Scala reference greedy WordPiece matcher") {
    import spark.implicits._
    val docs = corpus
    val wcount = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      toks(t).foreach(w => wcount(w) = wcount.getOrElse(w, 0L) + 1L)
    }
    val top8 = wcount.toSeq.sortBy { case (w, c) => (-c, w) }.take(8)
      .map(_._1).toSet
    val distinctW = wcount.keySet
    val chars = distinctW.flatMap(_.map(_.toString)).toSet
    val big2 = distinctW.filter(_.length >= 2)
      .flatMap(w => w.sliding(2).toSet)
    val startv = top8 ++ chars
    val contv = (big2 ++ chars).map("##" + _)

    def greedy(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      var first = true
      while (i < w.length) {
        val maxL = math.min(if (first) 8 else 2, w.length - i)
        val hit = (maxL to 1 by -1).collectFirst {
          case l if first && startv(w.substring(i, i + l)) =>
            w.substring(i, i + l)
          case l if !first && contv("##" + w.substring(i, i + l)) =>
            "##" + w.substring(i, i + l)
        }
        hit match {
          case Some(p) =>
            out += p; i += p.stripPrefix("##").length; first = false
          case None => return Vector("[UNK]")
        }
      }
      out.result()
    }

    val expected = docs.map { case (id, t) =>
      val aug = t + (if (id % 5 == 0) " k9"
                     else if (id % 5 == 3) " 9z" else "")
      val ws = toks(aug).map(greedy)
      id -> ((id, ws.size.toLong, ws.map(_.size.toLong).sum,
        ws.count(_ == Vector("[UNK]")).toLong,
        ws.map(_.mkString(" ")).mkString(" ")))
    }.toMap

    val got = SparkEntry.queries("p55_wordpiece_tokenize")(spark, sf)
      .select("doc_id", "n_words", "n_pieces", "n_unk", "pieces")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length === docs.length)
    var unkTotal = 0L
    got.foreach { case row @ (id, _, _, unk, _) =>
      assert(row === expected(id), s"doc $id")
      unkTotal += unk
    }
    // both [UNK] failure sites must fire: docs with id%5 in {0,3} get
    // a digit word, digits never enter the corpus-derived vocabulary
    assert(unkTotal > 0, "expected [UNK] docs in the corpus")
    assert(got.filter(r => r._1 % 5 != 0 && r._1 % 5 != 3)
      .forall(_._4 == 0L), "clean docs must have zero [UNK]")
  }

  test("p55 matcher measures pieces in code points, not UTF-16 units") {
    import graft.functions.WordPiece
    // "𝕏" (U+1D54F) is ONE code point but TWO UTF-16 units. The vocab
    // is built with Spark-SQL substr/length (code-point semantics), so
    // the matcher must probe on the same axis. A code-unit matcher
    // given "a𝕏y" probes its 2-unit continuation window at char index
    // 1 and sees only the surrogate pair "𝕏" — it can never try the
    // 2-code-point piece "##𝕏y" and splits the word as a/##𝕏/##y.
    val sv = Set("a", "𝕏")
    val cv = Set("##𝕏y", "##y", "##𝕏")
    assert(WordPiece.tokenize("a𝕏y", sv, cv, 8) === List("a", "##𝕏y"))
    // start-position probe: maxPiece counts code points ("𝕏y" = 2 cp)
    assert(WordPiece.tokenize("𝕏y", Set("𝕏y"), Set.empty, 2)
      === List("𝕏y"))
    assert(WordPiece.tokenize("𝕏y", Set("𝕏"), Set("##y"), 8)
      === List("𝕏", "##y"))
    // the [UNK] path must never probe (or emit) a lone surrogate half
    assert(WordPiece.tokenize("𝕏z", Set("z"), Set.empty, 8) === null)
    // BMP behavior is unchanged (identity offsets fast path)
    assert(WordPiece.tokenize("abc", Set("a"), Set("##b", "##c"), 8)
      === List("a", "##b", "##c"))
  }

  test("p55 caches ONE broadcast vocab pair per (session, dir)") {
    val df1 = SparkEntry.queries("p55_wordpiece_tokenize")(spark, sf)
    val n = Pipeline.wpVocabCache.size
    assert(Pipeline.wpVocabCache.containsKey((spark, sf)))
    // a second build must reuse the cached pair, not rerun the vocab
    // jobs and leak two more broadcasts
    val df2 = SparkEntry.queries("p55_wordpiece_tokenize")(spark, sf)
    assert(Pipeline.wpVocabCache.size === n)
    assert(df1.count() === df2.count())
  }
}
