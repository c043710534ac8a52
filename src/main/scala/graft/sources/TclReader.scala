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

  def parseRecords(
      spark: SparkSession, elems: Dataset[String], opts: TclOptions): Dataset[(String, Seq[String])] = {
    import spark.implicits._
    if (!opts.kv) {
      elems.map { e =>
        val fields = TclList.split(e)
        (e, fields: Seq[String])
      }
    } else {
      val dicts = elems.map(e => TclList.split(e).grouped(2)
        .collect { case Vector(k, v) => (k, v) }.toVector)
      val firstKeys = dicts.take(1).headOption.map(_.map(_._1)).getOrElse(Nil)
      val allKeys = dicts.flatMap(_.map(_._1)).distinct().collect().toSeq
      val keys = firstKeys ++ (allKeys.toSet -- firstKeys).toSeq.sorted
      val keyRecord = spark.createDataset(Seq((TclList.join(keys), keys: Seq[String])))
      val body = dicts.map { pairs =>
        val m = pairs.toMap
        (TclList.join(pairs.flatMap(p => Seq(p._1, p._2))),
          keys.map(k => m.getOrElse(k, "")): Seq[String])
      }
      keyRecord.union(body)
    }
  }

  def read(
      spark: SparkSession,
      paths: Seq[String],
      tcl: TclOptions,
      table: TableOptions): DataFrame =
    RecordPipeline.build(spark,
      parseRecords(spark, elements(spark, paths, tcl.lines), tcl), table)

  def parse(
      spark: SparkSession,
      elems: Dataset[String],
      tcl: TclOptions,
      table: TableOptions): DataFrame =
    RecordPipeline.build(spark, parseRecords(spark, elems, tcl), table)
}
