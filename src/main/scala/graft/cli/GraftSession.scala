package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources._

/** Engine session: builds the SparkSession, registers the compat
  * functions, loads each input file as a temp view (reference
  * lifecycle: SURVEY.md §3) and runs scripts statement-by-statement.
  */
object GraftSession {

  def build(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")): SparkSession = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .appName("sqawk-spark")
      .master(master)
      .config("spark.sql.shuffle.partitions", math.max(4, cpus).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // SQLite is maximally permissive about coercions; ANSI errors on
      // e.g. comparing 'c' with 10 would break dialect emulation.
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    spark
  }

  /** Read one file per its format options into the sqawk table shape. */
  def readFile(spark: SparkSession, spec: FileSpec, g: GlobalOptions, tableIndex: Int): DataFrame = {
    val tOpts = Options.tableOptions(spec, g, tableIndex)
    val paths = Seq(spec.filename)
    def stdinLines(): org.apache.spark.sql.Dataset[String] = {
      import spark.implicits._
      val text = scala.io.Source.stdin.mkString
      val rs = spec.options.getOrElse("RS", g.rs)
      spark.createDataset(SepSplit.splitRecords(text, rs))
    }
    spec.format match {
      case "awk" =>
        val awk = AwkOptions(
          fs = spec.options.getOrElse("FS", g.fs),
          rs = spec.options.getOrElse("RS", g.rs),
          fields = spec.options.getOrElse("fields", "auto"),
          trim = spec.options.getOrElse("trim", "none"))
        if (spec.filename == "-") AwkReader.parse(spark, stdinLines(), awk, tOpts)
        else AwkReader.read(spark, paths, awk, tOpts)
      case "csv" | "csv2" | "csvalt" =>
        val csv = CsvOptions(
          sep = spec.options.getOrElse("csvsep", ",").headOption.getOrElse(','),
          quote = spec.options.getOrElse("csvquote", "\"").headOption.getOrElse('"'),
          alt = spec.format != "csv")
        if (spec.filename == "-") CsvReader.parse(spark, stdinLines(), csv, tOpts)
        else CsvReader.read(spark, paths, csv, tOpts)
      case "json" =>
        val json = JsonOptions(
          kv = spec.options.get("kv").forall(Options.parseBool),
          lines = spec.options.get("lines").exists(Options.parseBool))
        JsonReader.read(spark, paths, json, tOpts)
      case "tcl" =>
        val tcl = TclOptions(
          kv = spec.options.get("kv").exists(Options.parseBool),
          lines = spec.options.get("lines").exists(Options.parseBool))
        TclReader.read(spark, paths, tcl, tOpts)
      case other =>
        throw new IllegalArgumentException(s"unknown input format: $other")
    }
  }

  /** Load all files, appending files that share a `table=` target with
    * continuing record numbers (reference: tests.tcl:213-223), and
    * register each table as a temp view. */
  def loadAll(spark: SparkSession, parsed: ParsedArgs): Seq[String] = {
    var tables = Vector.empty[(String, DataFrame)]
    for (spec <- parsed.files) {
      val tableIndex = tables.map(_._1).distinct.length
      val name = spec.options.getOrElse("table", Options.defaultTableName(tableIndex))
      val df = readFile(spark, spec, parsed.global, tableIndex)
      tables.indexWhere(_._1 == name) match {
        case -1 => tables :+= (name -> df)
        case i =>
          val (_, prev) = tables(i)
          val prefix = Options.tableOptions(spec, parsed.global, tableIndex).prefixName
          val nrCol = prev.columns.head // <prefix>nr is always first
          val offset = prev.agg(max(col(nrCol))).collect()(0).getLong(0)
          val renumbered = df.withColumn(df.columns.head, col(df.columns.head) + lit(offset))
            .toDF(prev.columns.take(df.columns.length) ++ df.columns.drop(prev.columns.length): _*)
          tables = tables.updated(i, name -> prev.unionByName(renumbered, allowMissingColumns = true))
      }
    }
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    tables.map(_._1)
  }
}
