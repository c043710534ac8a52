package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** The `fields=` projection/merge spec of the awk scan
  * (reference: lib/parsers/awk.tcl:82-135; behavior pinned by
  * tests.tcl:329-503).
  *
  * A spec like `1,2-3,5-end,auto` maps parsed fields to output
  * columns. Merged ranges (`2-3`) keep the ORIGINAL separators between
  * the merged fields, which is why [[SepSplit.sepsplit]] has the
  * interleaved fields+separators mode.
  */
object FieldMap {

  sealed trait Item
  case object Auto extends Item
  /** 1-based inclusive field range; `to = None` means "end". */
  final case class Range(from: Int, to: Option[Int]) extends Item

  /** `auto` (the default) means "one column per field, no merging". */
  val AutoOnly: Vector[Item] = Vector(Auto)

  private val itemRe: Regex = """(auto|([0-9]+)(?:-(end|[0-9]+))?)(,|$)""".r

  /** Parse a spec string. Mirrors the reference's tolerant scanner:
    * it picks out comma-terminated items left to right and ignores
    * anything it cannot match (reference: awk.tcl:111-135). */
  def parse(spec: String): Vector[Item] = {
    if (spec == "auto") return AutoOnly
    val out = ArrayBuffer.empty[Item]
    for (m <- itemRe.findAllMatchIn(spec) if m.group(1).nonEmpty) {
      val item = m.group(1)
      if (item == "auto") out += Auto
      else if (m.group(3) == null) out += Range(m.group(2).toInt, Some(m.group(2).toInt))
      else if (m.group(3) == "end") out += Range(m.group(2).toInt, None)
      else out += Range(m.group(2).toInt, Some(m.group(3).toInt))
    }
    out.toVector
  }

  /** Apply a parsed map to an interleaved fields+separators vector.
    *
    * Each `Range(from, to)` emits ONE column: the concatenation of
    * fields `from..to` with their separators. Out-of-range clamps
    * (fully out of range → empty column). `Auto` emits one column per
    * field starting at field index = number of mappings already
    * processed (the reference's `currentColumn` quirk, awk.tcl:84-103),
    * then stops.
    */
  def map(fieldsAndSeps: Vector[String], fieldMap: Vector[Item]): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    var currentColumn = 0
    var break = false
    for (item <- fieldMap if !break) {
      item match {
        case Auto =>
          var i = currentColumn * 2
          while (i < fieldsAndSeps.length) {
            out += fieldsAndSeps(i)
            i += 2
          }
          break = true
        case Range(from, to) =>
          val lo = (from - 1) * 2
          val hi = to match {
            case None => fieldsAndSeps.length - 1
            case Some(t) => (t - 1) * 2
          }
          val loC = math.max(lo, 0)
          val hiC = math.min(hi, fieldsAndSeps.length - 1)
          out += (if (loC > hiC) "" else fieldsAndSeps.slice(loC, hiC + 1).mkString)
      }
      currentColumn += 1
    }
    out.toVector
  }
}
