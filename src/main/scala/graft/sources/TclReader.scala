package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.TclList

/** Tcl-list scan (reference: lib/parsers/tcl.tcl; SURVEY.md §2.1 S7):
  * same record contract as the JSON scan but the wire format is Tcl
  * lists/dicts. `kv=0`: list of lists; `kv=1`: list of dicts with the
  * same first-object-order-then-alphabetical key union and a
  * synthesized key record. `lines=1`: one list/dict per line.
  */
final case class TclOptions(kv: Boolean = false, lines: Boolean = false)

object TclReader {

  private def elements(
      spark: SparkSession, paths: Seq[String], lines: Boolean): Dataset[String] = {
    import spark.implicits._
    if (lines)
      spark.read.textFile(paths: _*).filter((l: String) => l.trim.nonEmpty)
    else
      spark.read.option("wholetext", "true").textFile(paths: _*)
        .flatMap(text => TclList.split(text))
  }

  /** kv=0 list records as `(a0, fields)`. The kv=1 dict path goes
    * through [[RecordPipeline.buildKv]], which folds the key union
    * into its stats pass (single parse of the input). */
  def parseRecords(
      spark: SparkSession, elems: Dataset[String], opts: TclOptions): Dataset[(String, Seq[String])] = {
    import spark.implicits._
    elems.map { e =>
      val fields = TclList.split(e)
      (e, fields: Seq[String])
    }
  }

  private def buildFrom(
      spark: SparkSession,
      elems: Dataset[String],
      tcl: TclOptions,
      table: TableOptions): DataFrame = {
    import spark.implicits._
    if (tcl.kv)
      RecordPipeline.buildKv(spark,
        elems.map(e => TclList.split(e).grouped(2)
          .collect { case Vector(k, v) => (k, v) }.toVector: Seq[(String, String)]),
        table)
    else
      RecordPipeline.build(spark, parseRecords(spark, elems, tcl), table)
  }

  def read(
      spark: SparkSession,
      paths: Seq[String],
      tcl: TclOptions,
      table: TableOptions): DataFrame =
    buildFrom(spark, elements(spark, paths, tcl.lines), tcl, table)

  def parse(
      spark: SparkSession,
      elems: Dataset[String],
      tcl: TclOptions,
      table: TableOptions): DataFrame =
    buildFrom(spark, elems, tcl, table)
}
