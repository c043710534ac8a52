package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization measurement helper: INTERLEAVED same-JVM A/B
  * timing of candidate plan rewrites against the current spelling,
  * over the real sf data. The sandbox has a recurring co-tenant that
  * poisons sweep-to-sweep comparison (VERDICT r15 "what's wrong"), so
  * per-change evidence comes from alternating laps inside one JVM —
  * both arms sample the same noise — with min-of-laps reported, the
  * same protocol r15 used for the p62 hash swap.
  *
  * Each probe FIRST asserts the variants produce identical results
  * (collected, canonicalized, compared), then times them. Probes:
  *
  *  - md5kernel: conv(substr(md5(x),1,13)) spelling vs the fused
  *    graft_md5longs kernel over the corpus bigram stream (the p43/
  *    p46/p47/p49 hash shape).
  *  - simhash:   per-occurrence digesting (current) vs vocabulary-side
  *    digesting + broadcast re-attach (the p46 trick applied to
  *    p03/p44's simhash32).
  *  - p62stats:  the (k, cls) stats aggregation with two inline
  *    countDistincts (current: Expand×3 over the occurrence frame)
  *    vs a two-level pre-aggregation by (k, cls, doc_id, left_sym).
  *
  * Usage: runMain graft.queries.OptProbe [probe1,probe2] [laps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val wanted = args.headOption.filter(_.nonEmpty).filter(_ != "all")
      .map(_.split(",").toSet)
    val laps = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Md5Longs.register(spark)
    graft.functions.KmrEmit.register(spark)

    def loadavg(): Double =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage

    def docs: DataFrame = graft.Tables.documents(spark, sfDir)

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }

    /** Canonical string fingerprint of a small result for the
      * equality gate. */
    def fp(df: DataFrame): String = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(v => if (v == null) "\\N" else v.toString).mkString(""))
        .sorted.mkString("")
    }

    def ab(name: String, variants: Seq[(String, () => DataFrame)],
        check: Boolean = true): Unit = {
      if (wanted.forall(_.contains(name))) {
        spark.sparkContext.setJobDescription(s"optprobe:$name")
        if (check) {
          val fps = variants.map { case (vn, mk) => vn -> fp(mk()) }
          require(fps.map(_._2).distinct.size == 1,
            s"$name: variants DISAGREE: ${fps.map(_._1)}")
          println(s"[optprobe] $name: ${variants.size} variants agree " +
            s"(result fingerprint ${fps.head._2.hashCode})")
        }
        variants.foreach { case (_, mk) => time(mk()) } // warm-up lap
        val t = Array.fill(variants.size)(Vector.empty[Double])
        for (_ <- 1 to laps; i <- variants.indices)
          t(i) = t(i) :+ time(variants(i)._2())
        variants.indices.foreach { i =>
          val ts = t(i)
          println(f"[optprobe] $name/${variants(i)._1}%-12s " +
            f"min=${ts.min}%7.3f  laps=${ts.map(v => f"$v%.3f").mkString(",")}" +
            f"  load=${loadavg()}%.2f")
        }
      }
    }

    // ---- multirank: q45-class shared-ordering plan artifact -------------
    // Captured FIRST (the before-plan needs a session where
    // GraftFunctions.register has not yet installed the GlobalRank
    // rewrite): same-spec rank functions collapse into one multi-
    // expression Window — single-task WindowExec before round 16, a
    // GlobalRank chain over ONE shared range exchange after.
    if (wanted.forall(_.contains("multirank"))) {
      spark.range(0, 1000)
        .select((col("id") % 37).as("k"), col("id").as("payload"))
        .createOrReplaceTempView("mr_in")
      val sql =
        """SELECT k, payload,
          |  row_number() OVER (ORDER BY k) AS rn,
          |  rank()       OVER (ORDER BY k) AS rk,
          |  dense_rank() OVER (ORDER BY k) AS dr,
          |  ntile(7)     OVER (ORDER BY k) AS nt
          |FROM mr_in""".stripMargin
      def planOf = spark.sql(sql).queryExecution.executedPlan.toString
      val beforePlan = planOf
      graft.functions.GraftFunctions.register(spark)
      val afterPlan = planOf
      val dir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r16"))
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(
        dir.resolve("q45_style_multirank_before.txt"),
        "-- q45-class query: 4 rank-family functions over ONE shared " +
          "ordering,\n-- WITHOUT the round-16 GlobalRank multi-expression " +
          "extension\n" + beforePlan)
      java.nio.file.Files.writeString(
        dir.resolve("q45_style_multirank_after.txt"),
        "-- the same query WITH the extension (GlobalRank chain, one " +
          "range exchange)\n" + afterPlan)
      println(s"[optprobe] multirank: plans written to $dir")
    }

    // ---- md5kernel -----------------------------------------------------
    val bigramExpr =
      """CASE WHEN size(toks) >= 2 THEN
        |  transform(sequence(0, size(toks) - 2),
        |    k -> concat(toks[k], ' ', toks[k + 1]))
        |ELSE array() END""".stripMargin
    def gramStream = docs
      .withColumn("toks", expr(Pipeline.toksExpr))
      .select(col("lang"), explode(expr(bigramExpr)).as("g"))
    ab("md5kernel", Seq(
      // modular sum: forces per-row evaluation of h without the long
      // overflow a raw sum of millions of 52-bit values would hit
      "convsubstr" -> (() => gramStream.select(expr(
        "CAST(conv(substr(md5(concat('hll:', g)), 1, 13), 16, 10) AS BIGINT)").as("h"))
        .agg(sum(expr("h % 1000003")).as("s"))),
      "md5longs" -> (() => gramStream.select(expr(
        "graft_md5longs(concat('hll:', g)).h1").as("h"))
        .agg(sum(expr("h % 1000003")).as("s")))))

    // ---- simhash -------------------------------------------------------
    def tok = docs.select(col("doc_id"), explode(expr(Pipeline.toksExpr)).as("tok"))
    def simAgg(hashed: DataFrame): DataFrame = {
      val bitSums = (0 until 32).map { j =>
        val (g, dIdx) = (j / 8, j % 8)
        sum(expr(s"CASE WHEN (g$g >> ${31 - 4 * dIdx}) & 1 = 1 THEN 1 ELSE -1 END"))
          .as(s"s$j")
      }
      hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 32).map(j =>
            when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).cast("long").as("simhash"))
    }
    def occHashed = tok
      .select(col("doc_id"), expr("graft_md5longs(tok)").as("m"))
      .select(col("doc_id") +: (0 until 4).map(g => col(s"m.g$g").as(s"g$g")): _*)
    def vocabHashed = {
      val vocab = tok.select("tok").distinct()
        .select(col("tok"), expr("graft_md5longs(tok)").as("m"))
        .select(col("tok") +: (0 until 4).map(g => col(s"m.g$g").as(s"g$g")): _*)
      tok.join(broadcast(vocab), "tok").drop("tok")
    }
    def occLegacy = tok
      .select(col("doc_id") +: (0 until 4).map(g =>
        expr(s"CAST(conv(substr(md5(tok), ${g * 8 + 1}, 8), 16, 10) AS BIGINT)")
          .as(s"g$g")): _*)
    ab("simhash", Seq(
      "occ-kernel" -> (() => simAgg(occHashed)),
      "vocab-bcast" -> (() => simAgg(vocabHashed)),
      "occ-legacy" -> (() => simAgg(occLegacy))))

    // ---- p62stats ------------------------------------------------------
    if (wanted.forall(_.contains("p62stats"))) {
      val (minK, maxK, gidCap) = (2, 7, 1024L)
      val e = docs.withColumn("toks", expr(Pipeline.toksExpr))
        .select(col("doc_id"),
          explode(expr(s"graft_kmr_emit(toks, $minK, $maxK)")).as("w"))
        .select(col("doc_id"), col("w.k").as("k"), col("w.pos").as("pos"),
          (col("doc_id") * gidCap + col("w.pos")).as("gid"),
          col("w.cls").as("cls"), col("w.left_sym").as("left_sym"))
        .localCheckpoint()
      val reps = e.groupBy("k", "cls").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select("k", "cls")
      val occ = e.join(reps, Seq("k", "cls")).localCheckpoint()
      val up = occ.filter(col("k") > minK)
      def covDf = up.select((col("k") - 1).as("k"), col("doc_id"), col("pos"))
        .unionAll(up.select((col("k") - 1).as("k"), col("doc_id"),
          (col("pos") + expr("shiftleft(CAST(1 AS BIGINT), k - 1)")).as("pos")))
        .distinct().withColumn("c1", lit(1L))
      def joinedWith(cov: DataFrame) = occ.join(cov, Seq("k", "doc_id", "pos"), "left")
        .withColumn("covered", coalesce(col("c1"), lit(0L)))
      def joined = joinedWith(covDf)
      // cov join strategy (round 16): broadcast dies at factor 26
      // (cov is corpus-scale; only its ESTIMATE is small) — this arm
      // prices the scale-safe shuffled-hash spelling at sf0.1
      def joinedShj = joinedWith(covDf.hint("SHUFFLE_HASH"))
      def finish(st: DataFrame) = st
        .filter(col("n_unc") >= 1 &&
          (col("n_left_ctx") >= 2 || col("has_start") === 1L))
        .select(expr("shiftleft(CAST(1 AS BIGINT), k)").as("rep_len"),
          col("n_occ"), col("n_docs"), col("n_unc"),
          col("n_left_ctx"), col("min_gid"))
      def statsA = finish(joined.groupBy("k", "cls").agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(lit(1L) - col("covered")).as("n_unc"),
        (countDistinct(col("left_sym")) +
          max(when(col("left_sym").isNull, 1L).otherwise(0L))).as("n_left_ctx"),
        max(when(col("left_sym").isNull, 1L).otherwise(0L)).as("has_start"),
        min(col("gid")).as("min_gid")))
      def statsB = {
        val l1 = joined.groupBy("k", "cls", "doc_id", "left_sym").agg(
          count(lit(1)).as("cnt"),
          sum(lit(1L) - col("covered")).as("unc"),
          min(col("gid")).as("mg"))
        finish(l1.groupBy("k", "cls").agg(
          sum("cnt").as("n_occ"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum("unc").as("n_unc"),
          (countDistinct(col("left_sym")) +
            max(when(col("left_sym").isNull, 1L).otherwise(0L))).as("n_left_ctx"),
          max(when(col("left_sym").isNull, 1L).otherwise(0L)).as("has_start"),
          min(col("mg")).as("min_gid")))
      }
      def statsShj = finish(joinedShj.groupBy("k", "cls").agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(lit(1L) - col("covered")).as("n_unc"),
        (countDistinct(col("left_sym")) +
          max(when(col("left_sym").isNull, 1L).otherwise(0L))).as("n_left_ctx"),
        max(when(col("left_sym").isNull, 1L).otherwise(0L)).as("has_start"),
        min(col("gid")).as("min_gid")))
      ab("p62stats", Seq(
        "inline-2cd" -> (() => statsA),
        "two-level" -> (() => statsB),
        "cov-shj" -> (() => statsShj)))
      occ.unpersist(blocking = false)
      e.unpersist(blocking = false)
    }

    spark.stop()
  }
}
