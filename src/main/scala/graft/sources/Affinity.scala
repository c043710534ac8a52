package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** Column-metadata keys recording the DECLARED shape of a table
    * column — what `PRAGMA table_info` reports and what the DML layer
    * enforces. Set at table creation (ingest: RecordPipeline; scripts:
    * ScriptDdl's CREATE TABLE) and carried through view rebinds.
    *  - [[DeclKey]]: the declared type text, sqlite3-normalized (see
    *    [[declaredTypeText]]); "" for an untyped column.
    *  - [[PkKey]]: "rowid" for SQLite's `INTEGER PRIMARY KEY` rowid
    *    alias (autoassigns on NULL/omitted INSERT), "pk" for any other
    *    PRIMARY KEY member (uniqueness only, NULLs allowed).
    *  - [[NotNullKey]]: present when declared NOT NULL. */
  val DeclKey = "graft.decl.type"
  val PkKey = "graft.decl.pk"
  val NotNullKey = "graft.decl.notnull"

  /** sqlite3 (pinned on 3.x) reports the five canonical type keywords
    * uppercased in `PRAGMA table_info` and everything else verbatim:
    * int→INT, TeXt→TEXT, blob→BLOB, real→REAL, Integer→INTEGER, while
    * varchar(20), int8, numeric, double precision, foo stay as
    * written. */
  def declaredTypeText(decl: String): String = {
    val t = decl.trim
    if (Set("int", "integer", "text", "blob", "real")(t.toLowerCase)) t.toUpperCase else t
  }

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

  /** [[canonicalize]] as a native Catalyst expression chain, so the
    * ingest projection stays inside whole-stage codegen — a per-value
    * ScalaUDF here would break codegen and pay serialization on every
    * field of every record, the dominant ingest cost at scale. Parity
    * with the Scala version is pinned by ReadersSpec/CliSpec and the
    * i13 oracle. */
  def canonicalExpr(raw: Column, affinity: String): Column = affinity match {
    case "TEXT" | "BLOB" => raw
    case "REAL" =>
      when(isNumericExpr(raw), formatRealExpr(trimExpr(raw).try_cast("double")))
        .otherwise(raw)
    case _ => // INTEGER | NUMERIC
      // try_cast throughout: ANSI-safe (overflowing int64 text and the
      // non-numeric rows reaching the double branches yield null, never
      // a runtime error).
      val t = trimExpr(raw)
      val d = t.try_cast("double")
      when(t.rlike("^[+-]?[0-9]+$") && t.try_cast("long").isNotNull,
          t.try_cast("long").cast("string"))
        // The !rlike guard keeps int64-OVERFLOWING integer text (long
        // cast above was null) out of the lossless-long branch: its
        // double image can round exactly onto -2^63 and pass the
        // round-trip check, but SQLite (and canonicalize) store it as
        // REAL — e.g. '-9223372036854775809'.
        .when(isNumericExpr(raw) && !t.rlike("^[+-]?[0-9]+$") &&
            d === floor(d) &&
            d.between(-9.223372036854776e18, 9.223372036854775e18) &&
            d.cast("long").cast("double") === d,
          d.cast("long").cast("string"))
        .when(isNumericExpr(raw), formatRealExpr(d))
        .otherwise(raw)
  }

  /** Java `String.trim` semantics (strips chars <= U+0020). */
  private def trimExpr(c: Column): Column =
    regexp_replace(c, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")

  private def isNumericExpr(c: Column): Column =
    trimExpr(c).rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$")

  /** [[formatReal]] as an expression. Relies on Spark's double→string
    * cast matching Java `Double.toString` (it does — both render
    * shortest-round-trip with E-notation outside [1e-3, 1e7)). */
  private def formatRealExpr(d: Column): Column = {
    val s = d.cast("string")
    val sci = when(s.contains("E-"), regexp_replace(s, "E", "e"))
      .otherwise(regexp_replace(s, "E", "e+"))
    when(d === lit(Double.PositiveInfinity), "Inf")
      .when(d === lit(Double.NegativeInfinity), "-Inf")
      .when(d === floor(d) && abs(d) < 1e15,
        concat(d.cast("long").cast("string"), lit(".0")))
      .otherwise(when(s.contains("E"), sci).otherwise(s))
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
