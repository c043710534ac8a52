package graft.cli

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

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

  /** Spool stdin to a temp file in 1 MiB chunks (the reference's
    * buffered-read granularity, awk.tcl:150) so every format goes
    * through its normal file reader — stdin is never buffered whole
    * on the driver. */
  private def spoolStdin(): String = {
    val f = Files.createTempFile("graft-stdin", ".dat")
    f.toFile.deleteOnExit()
    val out = Files.newOutputStream(f)
    try {
      val buf = new Array[Byte](1 << 20)
      var n = System.in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = System.in.read(buf)
      }
    } finally out.close()
    f.toString
  }

  /** Read one file per its format options into the sqawk table shape. */
  def readFile(spark: SparkSession, spec: FileSpec, g: GlobalOptions, tableIndex: Int): DataFrame = {
    val tOpts = Options.tableOptions(spec, g, tableIndex)
    val paths = Seq(if (spec.filename == "-") spoolStdin() else spec.filename)
    spec.format match {
      case "awk" =>
        val awk = AwkOptions(
          fs = spec.options.getOrElse("FS", g.fs),
          rs = spec.options.getOrElse("RS", g.rs),
          fields = spec.options.getOrElse("fields", "auto"),
          trim = spec.options.getOrElse("trim", "none"))
        AwkReader.read(spark, paths, awk, tOpts)
      case "csv" | "csv2" | "csvalt" =>
        val csv = CsvOptions(
          sep = spec.options.getOrElse("csvsep", ",").headOption.getOrElse(','),
          quote = spec.options.getOrElse("csvquote", "\"").headOption.getOrElse('"'),
          alt = spec.format != "csv")
        CsvReader.read(spark, paths, csv, tOpts)
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

  /** Table row count: from the nr column's build-time metadata when
    * present (no Spark job), else one aggregate job as fallback. */
  private def rowCount(df: DataFrame): Long = {
    val meta = df.schema.head.metadata
    if (meta.contains(RecordPipeline.RowCountKey)) meta.getLong(RecordPipeline.RowCountKey)
    else df.count()
  }

  /** Load all files, appending files that share a `table=` target with
    * continuing record numbers (reference: tests.tcl:213-223), and
    * register each table as a temp view. With `-dbfile PATH`, tables
    * persist as parquet under `PATH.d/` across invocations — loaded
    * tables append to the persisted ones and everything is saved back
    * (the Spark analog of the reference's on-disk SQLite database,
    * README.md:146-150; tests.tcl:1398-1474). */
  def loadAll(spark: SparkSession, parsed: ParsedArgs): Seq[String] = {
    val dbDir: Option[Path] = parsed.global.dbfile match {
      case ":memory:" => None
      case p => Some(Paths.get(p + ".d"))
    }

    var tables = Vector.empty[(String, DataFrame)]
    var counts = Map.empty[String, Long]
    var dirty = Set.empty[String]

    // Seed with tables persisted by previous invocations.
    for (dir <- dbDir if Files.isDirectory(dir)) {
      val stream = Files.list(dir)
      val persisted =
        try stream.iterator()
          .asInstanceOf[java.util.Iterator[Path]]
          .asScala
          .filter(p => Files.isDirectory(p) && !p.getFileName.toString.startsWith("."))
          .toVector.sortBy(_.getFileName.toString)
        finally stream.close()
      for (sub <- persisted) {
        val name = sub.getFileName.toString
        val df = spark.read.parquet(sub.toString)
        val countFile = dir.resolve(s"$name.count")
        val n =
          if (Files.exists(countFile)) Files.readString(countFile).trim.toLong
          else df.count()
        tables :+= (name -> df)
        counts += name -> n
      }
    }

    for (spec <- parsed.files) {
      val tableIndex = tables.map(_._1).distinct.length
      val name = spec.options.getOrElse("table", Options.defaultTableName(tableIndex))
      val df = readFile(spark, spec, parsed.global, tableIndex)
      val n = rowCount(df)
      dirty += name
      tables.indexWhere(_._1 == name) match {
        case -1 =>
          tables :+= (name -> df)
          counts += name -> n
        case i =>
          val (_, prev) = tables(i)
          // Offset from tracked counts — no aggregation job per file.
          val offset = counts.getOrElse(name, 0L)
          val renumbered = df.withColumn(df.columns.head, col(df.columns.head) + lit(offset))
            .toDF(prev.columns.take(df.columns.length) ++ df.columns.drop(prev.columns.length): _*)
          tables = tables.updated(i, name -> prev.unionByName(renumbered, allowMissingColumns = true))
          counts += name -> (offset + n)
      }
    }

    // Persist changed tables back to the dbfile directory: write to a
    // temp subdir first (a table appended to itself still lazily READS
    // its old parquet), then swap.
    for (dir <- dbDir) {
      Files.createDirectories(dir)
      for ((name, df) <- tables if dirty.contains(name)) {
        val tmp = dir.resolve(s".tmp-$name")
        df.write.mode("overwrite").parquet(tmp.toString)
        val dest = dir.resolve(name)
        deleteRecursively(dest)
        Files.move(tmp, dest)
        Files.writeString(dir.resolve(s"$name.count"), counts(name).toString)
      }
      // Re-read swapped tables so views point at the new files.
      tables = tables.map { case (name, df) =>
        if (dirty.contains(name)) name -> spark.read.parquet(dir.resolve(name).toString)
        else name -> df
      }
    }

    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    tables.map(_._1)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asInstanceOf[java.util.Iterator[Path]].asScala
        .foreach(deleteRecursively)
      finally stream.close()
    }
    Files.deleteIfExists(p)
  }
}
