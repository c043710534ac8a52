package graft.sources

/** SQLite type-affinity emulation (SURVEY.md §1.3/§7.4).
  *
  * sqawk declares every field column INTEGER unless `datatypes=`
  * overrides it, and SQLite affinity then converts each VALUE that
  * looks numeric to numeric storage — so `001` prints as `1`, and with
  * REAL affinity as `1.0`, while `c` stays text
  * (reference: lib/classes/table.tcl:49-66; tests.tcl:1066-1106).
  *
  * We keep columns as StringType carrying the canonicalized rendering,
  * which preserves mixed-type columns exactly while letting Spark's
  * implicit string↔numeric coercion handle numeric WHERE clauses.
  */
object Affinity {

  private val intRe = """[+-]?\d+""".r
  private val realRe = """[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?""".r

  def hasAffinity(declared: String): String = {
    // SQLite's affinity-from-type-name rules, §3.1 of its datatype doc.
    val t = declared.toUpperCase
    if (t == "NULL") "BLOB" // `a1 null` parses as a constraint, not a type → no-type column = BLOB
    else if (t.contains("INT")) "INTEGER"
    else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT")) "TEXT"
    else if (t.contains("BLOB") || t.isEmpty) "BLOB"
    else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")) "REAL"
    else "NUMERIC"
  }

  /** Canonicalize one value under a given affinity. Null-safe. */
  def canonicalize(value: String, affinity: String): String = {
    if (value == null) return null
    affinity match {
      case "TEXT" | "BLOB" => value
      case "REAL" =>
        if (isNumeric(value)) formatReal(value.trim.toDouble) else value
      case _ => // INTEGER | NUMERIC
        val t = value.trim
        if (intRe.matches(t)) {
          try String.valueOf(t.toLong)
          catch { case _: NumberFormatException => formatReal(t.toDouble) }
        } else if (isNumeric(value)) {
          // SQLite stores REAL text as INTEGER when the conversion is
          // lossless ('2.0'→2, '1e2'→100; verified against sqlite3).
          val d = t.toDouble
          realToLosslessLong(d) match {
            case Some(l) => String.valueOf(l)
            case None => formatReal(d)
          }
        } else value
    }
  }

  /** The double, if it is integral and round-trips through int64. */
  private def realToLosslessLong(d: Double): Option[Long] =
    if (d == d.floor && !d.isInfinite &&
        d >= -9.223372036854776e18 && d <= 9.223372036854775e18) {
      val l = d.toLong
      if (l.toDouble == d) Some(l) else None
    } else None

  private def isNumeric(value: String): Boolean = realRe.matches(value.trim)

  /** SQLite renders REAL storage with a trailing `.0` for integral
    * values (`%!.15g`): 1 → "1.0", 0.5 → "0.5". */
  def formatReal(d: Double): String = {
    if (d.isInfinite) { if (d > 0) "Inf" else "-Inf" }
    else if (d == d.floor && math.abs(d) < 1e15) {
      val l = d.toLong
      s"$l.0"
    } else {
      val s = String.valueOf(d)
      if (s.contains('E')) {
        // java "1.0E20" → sqlite-style "1.0e+20"
        val idx = s.indexOf('E')
        val exp = s.substring(idx + 1)
        s.substring(0, idx) + "e" + (if (exp.startsWith("-")) exp else "+" + exp)
      } else s
    }
  }
}
