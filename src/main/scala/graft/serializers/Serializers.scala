package graft.serializers

import java.io.Writer

import scala.collection.mutable.ArrayBuffer

/** Result serializers (reference: lib/serializers directory; SURVEY.md
  * §2.1 K1-K5). Like the reference, these are driver-side row pumps writing
  * to stdout — the distributed part of the engine ends at
  * `toLocalIterator`, so memory stays bounded (only the table sink
  * buffers, which the reference does too).
  *
  * One serializer instance spans ALL statements of a script — e.g. the
  * JSON sink emits a single array across result sets
  * (reference: tests.tcl:195-200).
  */
trait Serializer {
  /** One result row as ordered (column, value) pairs; value null-free
    * (SQL NULL is rendered "" upstream). */
  def serialize(record: Seq[(String, String)]): Unit
  def close(): Unit
}

/** K1: awk sink — join values with OFS, append ORS
  * (reference: lib/serializers/awk.tcl:27-29). */
final class AwkSerializer(out: Writer, ofs: String = " ", ors: String = "\n")
    extends Serializer {
  def serialize(record: Seq[(String, String)]): Unit = {
    out.write(record.iterator.map(_._2).mkString(ofs))
    out.write(ors)
  }
  def close(): Unit = out.flush()
}

/** K2: CSV sink (reference: lib/serializers/csv.tcl; quoting pinned by
  * tests.tcl:780-796 — quote iff the value needs it). */
final class CsvSerializer(out: Writer, sep: Char = ',', quote: Char = '"')
    extends Serializer {
  private def field(v: String): String =
    if (v.indexOf(sep) >= 0 || v.indexOf(quote) >= 0 || v.exists(c => c == '\n' || c == '\r'))
      s"$quote${v.replace(quote.toString, s"$quote$quote")}$quote"
    else v
  def serialize(record: Seq[(String, String)]): Unit = {
    out.write(record.iterator.map(p => field(p._2)).mkString(sep.toString))
    out.write("\n")
  }
  def close(): Unit = out.flush()
}

/** K3: JSON sink — one array over all rows; objects (`kv=1`) or arrays
  * (`kv=0`); ALL values as strings; `pretty` matches tcllib
  * json::write's indented object format
  * (reference: lib/serializers/json.tcl; tests.tcl:898-944). */
final class JsonSerializer(out: Writer, kv: Boolean = true, pretty: Boolean = false)
    extends Serializer {
  private var first = true
  out.write("[")

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  def serialize(record: Seq[(String, String)]): Unit = {
    if (!first) out.write(",")
    first = false
    if (kv) {
      if (pretty) {
        out.write("{\n")
        out.write(record.iterator
          .map { case (k, v) => s"    ${jsonString(k)} : ${jsonString(v)}" }
          .mkString(",\n"))
        out.write("\n}")
      } else {
        out.write(record.iterator
          .map { case (k, v) => s"${jsonString(k)}:${jsonString(v)}" }
          .mkString("{", ",", "}"))
      }
    } else {
      out.write(record.iterator.map(p => jsonString(p._2)).mkString("[", ",", "]"))
    }
  }

  def close(): Unit = { out.write("]\n"); out.flush() }
}

/** K5: Tcl sink — rows as Tcl lists (`kv=0`) or flat k-v dicts
  * (`kv=1`); `pretty` = one row per line
  * (reference: lib/serializers/tcl.tcl; tests.tcl:798-833). */
final class TclSerializer(out: Writer, kv: Boolean = false, pretty: Boolean = false)
    extends Serializer {
  import graft.functions.TclList
  private var first = true
  def serialize(record: Seq[(String, String)]): Unit = {
    if (!pretty && !first) out.write(" ")
    first = false
    val inner =
      if (kv) TclList.join(record.flatMap(p => Seq(p._1, p._2)))
      else TclList.join(record.map(_._2))
    out.write(TclList.quoteElem(inner))
    if (pretty) out.write("\n")
  }
  def close(): Unit = { if (!pretty) out.write("\n"); out.flush() }
}

/** K4: table sink — buffers everything (the reference does too), then
  * renders Unicode box-drawing via [[Tabulate]]
  * (reference: lib/serializers/table.tcl + lib/tabulate.tcl). */
final class TableSerializer(
    out: Writer,
    alignments: Seq[String] = Nil,
    margins: Int = 0,
    style: String = "default")
    extends Serializer {
  private val rows = ArrayBuffer.empty[Seq[String]]
  def serialize(record: Seq[(String, String)]): Unit = rows += record.map(_._2)
  def close(): Unit = {
    if (rows.nonEmpty) {
      out.write(Tabulate.render(rows.toSeq, alignments, margins, style))
      out.write("\n")
    }
    out.flush()
  }
}
