package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The default "awk" scan: regex record separator, regex field
  * separator, optional trim and `fields=` remapping
  * (reference: lib/parsers/awk.tcl; SURVEY.md §2.1 S1-S3).
  *
  * Scale design:
  *  - `RS='\n'` (the default) → `spark.read.textFile`: splittable,
  *    streamed, never holds a file in memory — the 100 TB path.
  *  - arbitrary regex RS → whole-file read + [[SepSplit.splitRecords]]
  *    per file (a non-'\n' RS is not splittable in general; documented
  *    limitation mirroring SURVEY.md §7.5 — same semantics as the
  *    reference's buffered scan, awk.tcl:170-193).
  *  - Field splitting happens in executors via `Dataset.map`; the
  *    `-1` trick (`FS='x^'`, a never-matching regex) naturally skips
  *    split work because the regex never matches.
  */
final case class AwkOptions(
    fs: String = "[ \t]+",
    rs: String = "\n",
    fields: String = "auto",
    trim: String = "none")

object AwkReader {

  /** Path(s) → record stream. */
  def records(spark: SparkSession, paths: Seq[String], rs: String): Dataset[String] = {
    import spark.implicits._
    if (rs == "\n") {
      spark.read.textFile(paths: _*)
    } else {
      SepSplit.validateSeparator(rs, "RS")
      spark.read.option("wholetext", "true").textFile(paths: _*)
        .flatMap(text => SepSplit.splitRecords(text, rs))
    }
  }

  /** Record stream → parsed `(rawRecord, fields)` pairs. */
  def parseRecords(
      records: Dataset[String], awk: AwkOptions): Dataset[(String, Seq[String])] = {
    val spark = records.sparkSession
    import spark.implicits._
    SepSplit.validateSeparator(awk.fs, "FS")
    val fm = FieldMap.parse(awk.fields)
    val fs = awk.fs
    val trimMode = awk.trim
    if (fm == FieldMap.AutoOnly) {
      records.map { rec =>
        val r = SepSplit.trimRecord(rec, trimMode)
        (r, SepSplit.sepsplit(r, fs, includeSeparators = false): Seq[String])
      }
    } else {
      records.map { rec =>
        val r = SepSplit.trimRecord(rec, trimMode)
        (r, FieldMap.map(SepSplit.sepsplit(r, fs, includeSeparators = true), fm): Seq[String])
      }
    }
  }

  def read(
      spark: SparkSession,
      paths: Seq[String],
      awk: AwkOptions,
      table: TableOptions): DataFrame =
    RecordPipeline.build(spark, parseRecords(records(spark, paths, awk.rs), awk), table)

  /** Parse an in-memory record stream (tests and derived pipelines). */
  def parse(
      spark: SparkSession,
      lines: Dataset[String],
      awk: AwkOptions,
      table: TableOptions): DataFrame =
    RecordPipeline.build(spark, parseRecords(lines, awk), table)
}
