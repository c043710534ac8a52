package graft.serializers

/** Unicode box-drawing table renderer with the reference's exact
  * geometry (reference: lib/tabulate.tcl:370-488): per-column width =
  * max wide-char-aware width, `margins` extra padding, alignment
  * left/center/right (default center, center splits padding
  * floor-left), a separator line between EVERY pair of rows, and
  * `default` (single-line box) or `loFi` (+/-/|) styles.
  */
object Tabulate {

  private case class SubStyle(left: String, padding: String, separator: String, right: String)
  private case class Style(top: SubStyle, sep: SubStyle, row: SubStyle, bottom: SubStyle)

  private val default = Style(
    SubStyle("┌", "─", "┬", "┐"),
    SubStyle("├", "─", "┼", "┤"),
    SubStyle("│", " ", "│", "│"),
    SubStyle("└", "─", "┴", "┘"))

  private val loFi = Style(
    SubStyle("+", "-", "+", "+"),
    SubStyle("+", "-", "+", "+"),
    SubStyle("|", " ", "|", "|"),
    SubStyle("+", "-", "+", "+"))

  /** Fixed-font display width: CJK/fullwidth code points count 2
    * (reference: lib/tabulate.tcl:100-160,364-367). */
  def displayWidth(s: String): Int = {
    var w = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      w += (if (isWide(cp)) 2 else 1)
      i += Character.charCount(cp)
    }
    w
  }

  private def isWide(cp: Int): Boolean =
    (cp >= 0x1100 && cp <= 0x115F) || (cp >= 0x2E80 && cp <= 0x303E) ||
    (cp >= 0x3041 && cp <= 0x33FF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0xA000 && cp <= 0xA4CF) ||
    (cp >= 0xA960 && cp <= 0xA97F) || (cp >= 0xAC00 && cp <= 0xD7A3) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0xFE10 && cp <= 0xFE19) ||
    (cp >= 0xFE30 && cp <= 0xFE6F) || (cp >= 0xFF00 && cp <= 0xFF60) ||
    (cp >= 0xFFE0 && cp <= 0xFFE6) || (cp >= 0x1B000 && cp <= 0x1B001) ||
    (cp >= 0x1F200 && cp <= 0x1F251) || (cp >= 0x20000 && cp <= 0x2FFFD) ||
    (cp >= 0x30000 && cp <= 0x3FFFD)

  def render(
      data: Seq[Seq[String]],
      alignments: Seq[String] = Nil,
      margins: Int = 0,
      styleName: String = "default"): String = {
    val style = styleName match {
      case "default" => default
      case "loFi" => loFi
      case other => throw new IllegalArgumentException(s"unknown style: $other")
    }
    val nCols = data.map(_.length).maxOption.getOrElse(0)
    val widths = (0 until nCols).map { i =>
      data.iterator.map(r => displayWidth(r.lift(i).getOrElse(""))).maxOption.getOrElse(0)
    }
    val emptyRow = Seq.fill(nCols)("")

    def formatRow(sub: SubStyle, row: Seq[String]): String = {
      val sb = new StringBuilder(sub.left)
      for (i <- 0 until nCols) {
        val field = row.lift(i).getOrElse("")
        val padding = widths(i) - displayWidth(field) + 2 * margins
        val (l, r) = alignments.lift(i).getOrElse("center") match {
          case "" | "c" | "center" => (padding / 2, padding - padding / 2)
          case "l" | "left" => (margins, padding - margins)
          case "r" | "right" => (padding - margins, margins)
          case other => throw new IllegalArgumentException(s"unknown alignment: $other")
        }
        sb.append(sub.padding * l).append(field).append(sub.padding * r)
        if (i < nCols - 1) sb.append(sub.separator)
      }
      sb.append(sub.right).toString
    }

    val lines = Seq(formatRow(style.top, emptyRow)) ++
      data.zipWithIndex.flatMap { case (row, i) =>
        Seq(formatRow(style.row, row)) ++
          (if (i < data.length - 1) Seq(formatRow(style.sep, emptyRow)) else Nil)
      } ++ Seq(formatRow(style.bottom, emptyRow))
    lines.mkString("\n")
  }
}
