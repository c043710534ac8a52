package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Table-shaping options shared by every scan format
  * (reference: lib/classes/sqawk.tcl:139-147 defaults,
  * lib/classes/table.tcl:30-78 schema rules). */
final case class TableOptions(
    table: String = "a",
    prefix: Option[String] = None,
    nf: Int = 10,
    mnf: String = "expand", // expand | crop | error
    header: Boolean = false,
    columns: Seq[String] = Nil,
    datatypes: Seq[String] = Nil, // SQLite decl types per field; default INTEGER
    f0: Boolean = true) {
  def prefixName: String = prefix.getOrElse(table)
}

/** Turns parsed records `(rawRecord, fields)` into the sqawk table
  * shape `[<p>nr, <p>nf, <p>0, <p>1..<p>N]`
  * (reference: lib/classes/table.tcl:59-149; SURVEY.md §1.2).
  *
  * Spark-first notes:
  *  - `anr` must be CONTIGUOUS and input-ordered (it is SQLite's rowid
  *    in the reference), so we use `zipWithIndex` — one lightweight
  *    extra job to count partitions, still fully parallel — rather
  *    than `monotonically_increasing_id` (not contiguous).
  *  - `MNF=expand` needs the global max field count before the schema
  *    can be fixed (Spark schemas are immutable); that is a cheap
  *    map-side `max` aggregation over the cached parsed records.
  *  - Values are StringType carrying SQLite-affinity-canonicalized
  *    renderings (see [[Affinity]]); `get()` (null past the end) gives
  *    the reference's NULL padding for short records.
  */
object RecordPipeline {

  def build(
      spark: SparkSession,
      records: Dataset[(String, Seq[String])],
      opts: TableOptions): DataFrame = {
    import spark.implicits._

    val persisted = records.persist(StorageLevel.MEMORY_AND_DISK)
    try buildImpl(spark, persisted, opts)
    finally persisted.unpersist(blocking = false)
  }

  private def buildImpl(
      spark: SparkSession,
      records: Dataset[(String, Seq[String])],
      opts: TableOptions): DataFrame = {
    import spark.implicits._

    // Header consumption: the FIRST parsed record supplies column
    // names and is not loaded (reference: lib/classes/sqawk.tcl:176-181).
    val headerNames: Seq[String] =
      if (opts.header) records.take(1).headOption.map(_._2.toSeq).getOrElse(Nil)
      else Nil

    // Contiguous 1-based record numbers in input order.
    val indexed = records.rdd.zipWithIndex()
    val body =
      (if (opts.header) indexed.filter(_._2 > 0L).map { case (r, i) => (r, i) }
       else indexed.map { case (r, i) => (r, i + 1) })
        .map { case ((a0, fields), nr) => (nr, a0, fields) }
        .toDF("__nr", "__a0", "__fields")

    // MNF resolution (reference: table.tcl:102-132; tests.tcl:1158-1396).
    val cropped = opts.mnf match {
      case "crop" =>
        body.withColumn("__fields", slice(col("__fields"), 1, opts.nf))
      case "error" =>
        val maxNf = body.agg(max(size(col("__fields")))).as[Int].collect().headOption.getOrElse(0)
        if (maxNf > opts.nf)
          throw new IllegalStateException(
            s"table ${opts.table} has no column for field $maxNf (NF=${opts.nf}, MNF=error)")
        body
      case "expand" => body
      case other =>
        throw new IllegalArgumentException(s"invalid MNF value: $other")
    }

    val numFields = opts.mnf match {
      case "expand" =>
        val maxNf = cropped.agg(max(size(col("__fields")))).as[Int].collect().headOption.getOrElse(0)
        math.max(opts.nf, maxNf)
      case _ => opts.nf
    }

    val p = opts.prefixName
    val fieldNames = (1 to numFields).map(i => fieldName(p, i, headerNames, opts.columns))
    fieldNames.foreach { n =>
      if (n.contains("`"))
        throw new IllegalArgumentException(s"column name $n contains a grave accent")
    }

    val canonical = udf((v: String, affinity: String) => Affinity.canonicalize(v, affinity))
    val fieldCols = (1 to numFields).map { i =>
      val declared = opts.datatypes.lift(i - 1).getOrElse("INTEGER")
      val affinity = Affinity.hasAffinity(declared)
      val raw = get(col("__fields"), lit(i - 1))
      val value = if (affinity == "TEXT" || affinity == "BLOB") raw
        else canonical(raw, lit(affinity))
      value.as(fieldNames(i - 1))
    }

    val base = Seq(
      col("__nr").as(s"${p}nr"),
      size(col("__fields")).as(s"${p}nf")) ++
      (if (opts.f0) Seq(col("__a0").as(s"${p}0")) else Nil)

    cropped.select(base ++ fieldCols: _*)
  }

  /** Field column naming: `columns=` wins where non-empty, else the
    * header name, else the generated `<prefix>N`
    * (reference: lib/classes/sqawk.tcl:182-190; tests.tcl:261-327). */
  private def fieldName(
      prefix: String, i: Int, headerNames: Seq[String], columns: Seq[String]): String = {
    columns.lift(i - 1).filter(_.nonEmpty)
      .orElse(headerNames.lift(i - 1).filter(_.nonEmpty))
      .getOrElse(s"$prefix$i")
  }
}
