package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.{AwkOptions, AwkReader, TableOptions}

/** Ingest micro-benchmark: drives a large generated text file through
  * the full awk-scan path (read → split → RecordPipeline with affinity
  * canonicalization) and aggregates, printing wall time and the plan —
  * the check that the ingest projection stays in whole-stage codegen
  * with no ScalaUDF and no persisted intermediate. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-ingest-bench.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = AwkReader.read(spark, Seq(path), AwkOptions(), TableOptions(nf = 6))
    val agg = df.agg(
      count(lit(1)).as("rows"),
      sum(col("a1").cast("double")).as("s1"),
      max(col("anf")).as("maxnf"))
    agg.explain("formatted")
    val row = agg.collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[ingest-bench] rows=${row.getLong(0)} s1=${row.getDouble(1)}%.1f maxnf=${row.getInt(2)} wall=$secs%.2f s")
    spark.stop()
  }
}
