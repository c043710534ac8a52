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

  /** [[formatReal]] as an expression — the same `%!.15g` contract via
    * `format_string` (a Java formatter under the hood, so digits
    * match the Scala path exactly) plus the trailing-zero strip.
    * In the non-integral/1e15+ branch the mantissa always carries a
    * '.', so the zero-strip regex never eats integer digits. */
  private def formatRealExpr(d: Column): Column = {
    val g = format_string("%.15g", d)
    val stripped = regexp_replace(g, "0+(e[+-][0-9]+)?$", "$1")
    val dotted = regexp_replace(stripped, "\\.(e|$)", ".0$1")
    when(d === lit(Double.PositiveInfinity), "Inf")
      .when(d === lit(Double.NegativeInfinity), "-Inf")
      .when(d === floor(d) && abs(d) < 1e15,
        concat(d.cast("long").cast("string"), lit(".0")))
      .otherwise(dotted)
  }

  /** The double, if it is integral and round-trips through int64. */
  private def realToLosslessLong(d: Double): Option[Long] =
    if (d == d.floor && !d.isInfinite &&
        d >= -9.223372036854776e18 && d <= 9.223372036854775e18) {
      val l = d.toLong
      if (l.toDouble == d) Some(l) else None
    } else None

  private def isNumeric(value: String): Boolean = realRe.matches(value.trim)

  /** SQLite renders REAL storage with `%!.15g` — 15 significant
    * digits, trailing fraction zeros stripped, the decimal point
    * forced (`!`): 1 → "1.0", 0.5 → "0.5", 0.1+0.2 → "0.3" (NOT the
    * 17-digit shortest round-trip "0.30000000000000004"),
    * 2^63 as a REAL → "9.22337203685478e+18". Java's `%g` keeps the
    * trailing zeros C strips, hence the post-pass. (Until round 7
    * this rendered shortest-round-trip text, which diverged from
    * sqlite3 exactly when a double needs >15 digits.) */
  def formatReal(d: Double): String = {
    if (d.isInfinite) { if (d > 0) "Inf" else "-Inf" }
    else if (d != d) "NaN"
    else if (d == d.floor && math.abs(d) < 1e15) {
      val l = d.toLong
      s"$l.0"
    } else {
      // non-integral or >=1e15, so %.15g always emits a '.' here
      val s = String.format(java.util.Locale.ROOT, "%.15g", d)
      val i = s.indexOf('e')
      val (mant0, exp) = if (i < 0) (s, "") else (s.substring(0, i), s.substring(i))
      var end = mant0.length
      while (end > 0 && mant0.charAt(end - 1) == '0') end -= 1
      val mant = if (end > 0 && mant0.charAt(end - 1) == '.')
        mant0.substring(0, end) + "0" else mant0.substring(0, end)
      mant + exp
    }
  }
}
