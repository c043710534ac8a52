package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{AwkOptions, AwkReader, TableOptions}
import graft.queries.Ingest

/** Stage-level attribution probe for i20's factor-26 residual
  * (VERDICT r14 #1): wall + per-stage timings for ingest-only,
  * ingest+global sort on the plain column, ingest+global sort on the
  * storage-class key, and the full global row_number — isolating awk
  * parse/canonicalization, the range exchange, the sort-comparator
  * cost and the rank overhead. The round-15 finding it produced:
  * SortExec evaluated the affinity struct key (regex + TRY cast)
  * inside the comparator, O(n log n) times — fixed by
  * [[graft.plans.SortKeyMaterialization]]; measured 8.8 → 2.9 s at
  * sf2.6 (SURVEY §8). Kept as the sort-attribution harness; the
  * cross-stage row-count assertion keeps it self-falsifying. */
object I20Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf2.6")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "96g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    // stage-level attribution: name, task count, total task time
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for (s <- si.submissionTime; c <- si.completionTime)
            yield (c - s) / 1000.0).getOrElse(-1.0)
          stages.add(f"    stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"wall=$wall%6.2f ${si.name.take(90)}")
        }
      })

    def consume(df: org.apache.spark.sql.DataFrame): Long = {
      val rdd = df.queryExecution.executedPlan.execute()
      spark.sparkContext.runJob(rdd, (it: Iterator[_]) => {
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; c
      }).sum
    }
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // lap 1 warms codegen/IO; best-of-3 is the figure
      var rows = 0L
      var parts = 0
      val times = (1 to 3).map { i =>
        if (i == 3) stages.clear()
        val t0 = System.nanoTime()
        val df = mk
        rows = consume(df)
        parts = df.queryExecution.executedPlan.execute().getNumPartitions
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[i20probe] $label%-28s rows=$rows%9d parts=$parts%3d " +
        f"laps=${times.map(t => f"$t%6.2f").mkString(" ")}")
      Thread.sleep(300) // let the last lap's stage events drain
      stages.forEach(s => println(s))
      stages.clear()
      // every stage consumes the same 390k-row (at sf2.6) table — a
      // row-count drift means the probe is no longer measuring i20
      assert(rows > 0, s"$label consumed zero rows")
    }

    // i20's input, replicated from Ingest (its builders are private):
    // awk-parse customer-derived lines with an affinity-mixed first
    // field, nf=2 table load
    def ingest(s: SparkSession): org.apache.spark.sql.DataFrame = {
      import s.implicits._
      val src = graft.Tables.customer(s, d)
        .select(col("c_custkey").as("ck"), col("c_name").as("nm"))
        .orderBy("ck")
      val lines = src.select(concat_ws(" ",
        when(col("ck") % 7 === 0, concat(lit("t"), col("nm")))
          .otherwise((col("ck") * 37 % 100000).cast("string")),
        col("nm")).cast("string")).as[String]
      val df = AwkReader.parse(s, lines, AwkOptions(), TableOptions(nf = 2))
      df.createOrReplaceTempView("g_aff")
      df
    }

    time("ingest_only")(ingest(spark))
    time("ingest+sort_plain") {
      ingest(spark)
      spark.sql("SELECT a2 FROM g_aff ORDER BY a2")
    }
    time("ingest+sort_affinity_key") {
      ingest(spark)
      spark.sql("SELECT a2 FROM g_aff ORDER BY a1, a2")
    }
    time("full_i20_rownum") {
      ingest(spark)
      spark.sql("""SELECT a2, CAST(row_number() OVER (ORDER BY a1, a2) AS BIGINT)
                  |AS rnk FROM g_aff""".stripMargin)
    }
    spark.stop()
  }
}
