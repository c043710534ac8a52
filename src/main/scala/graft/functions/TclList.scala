package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal Tcl list/dict tokenizer.
  *
  * Implements the subset of Tcl list syntax the reference's compat
  * functions rely on (reference: lib/utils.tcl:39-45 registers Tcl's own
  * `lindex`/`llength`/`lrange`/`dict get`/`dict exists` into SQLite;
  * behavior pinned by tests.tcl:1108-1156):
  *
  *   - elements separated by runs of whitespace
  *   - `{braced}` elements: literal content, nested braces balance,
  *     backslash keeps the next char from counting toward balance
  *   - `"quoted"` elements: until the closing quote, backslash escapes
  *   - bare words: until whitespace, backslash escapes
  *
  * This is a parser for WELL-FORMED lists (what the tests exercise); it
  * does not implement full Tcl semantics (no command/variable
  * substitution — Tcl lists never have those anyway).
  */
object TclList {

  /** One-entry per-thread memo for [[split]]: scripts routinely probe
    * the same list/dict column with several compat calls per row
    * (`dict_get(a1,…), dict_exists(a1,…), …`), and each call would
    * otherwise re-tokenize the identical string. Keyed by value
    * equality (the equal-string compare is far cheaper than a
    * re-parse); one entry suffices because per-row calls on the same
    * input are adjacent. */
  private val lastSplit = new ThreadLocal[(String, Vector[String])]

  /** [[split]] through the per-thread memo. */
  def splitCached(s: String): Vector[String] = {
    val e = lastSplit.get()
    if (e != null && ((e._1 eq s) || e._1 == s)) e._2
    else {
      val v = split(s)
      lastSplit.set((s, v))
      v
    }
  }

  /** Split a Tcl list string into its top-level elements. */
  def split(s: String): Vector[String] = {
    val out = ArrayBuffer.empty[String]
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val sb = new StringBuilder
        s.charAt(i) match {
          case '{' =>
            var depth = 1
            i += 1
            while (i < n && depth > 0) {
              val c = s.charAt(i)
              if (c == '\\' && i + 1 < n) { sb.append(c).append(s.charAt(i + 1)); i += 2 }
              else {
                if (c == '{') depth += 1
                else if (c == '}') depth -= 1
                if (depth > 0) sb.append(c)
                i += 1
              }
            }
          case '"' =>
            i += 1
            var done = false
            while (i < n && !done) {
              val c = s.charAt(i)
              if (c == '\\' && i + 1 < n) { sb.append(unescape(s.charAt(i + 1))); i += 2 }
              else if (c == '"') { done = true; i += 1 }
              else { sb.append(c); i += 1 }
            }
          case _ =>
            var done = false
            while (i < n && !done) {
              val c = s.charAt(i)
              if (Character.isWhitespace(c)) done = true
              else if (c == '\\' && i + 1 < n) { sb.append(unescape(s.charAt(i + 1))); i += 2 }
              else { sb.append(c); i += 1 }
            }
        }
        out += sb.toString
      }
    }
    out.toVector
  }

  private def unescape(c: Char): Char = c match {
    case 'n' => '\n'
    case 't' => '\t'
    case 'r' => '\r'
    case other => other
  }

  /** Render elements back to a canonical Tcl list string (brace elements
    * containing whitespace/specials; empty element → `{}`). */
  def join(elems: Seq[String]): String =
    elems.map(quoteElem).mkString(" ")

  def quoteElem(e: String): String =
    if (e.isEmpty) "{}"
    else if (e.exists(c => Character.isWhitespace(c) || "{}\"\\$;[]".indexOf(c.toInt) >= 0)) {
      if (balancedBraces(e)) "{" + e + "}"
      else e.flatMap {
        case c if Character.isWhitespace(c) || "{}\"\\$;[]".indexOf(c.toInt) >= 0 => "\\" + c
        case c => c.toString
      }
    } else e

  private def balancedBraces(e: String): Boolean = {
    var depth = 0
    var i = 0
    while (i < e.length) {
      e.charAt(i) match {
        case '\\' => i += 1
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth < 0) return false
        case _ =>
      }
      i += 1
    }
    depth == 0
  }

  /** Tcl `lindex` with a chain of indices (each indexes into the result
    * of parsing the previous level as a list). Out-of-range → "". */
  def lindex(list: String, indices: Seq[Int]): String =
    indices.zipWithIndex.foldLeft(list) { case (cur, (idx, lvl)) =>
      // memo only the top level: nested levels parse derived strings
      // that would churn the one-entry cache
      val elems = if (lvl == 0) splitCached(cur) else split(cur)
      if (idx < 0 || idx >= elems.length) "" else elems(idx)
    }

  def llength(list: String): Int = splitCached(list).length

  /** Tcl `lrange`: inclusive range, clamped; supports "end"/"end-N". */
  def lrange(list: String, first: String, last: String): String = {
    val elems = splitCached(list)
    def resolve(spec: String): Int = {
      val t = spec.trim
      if (t == "end") elems.length - 1
      else if (t.startsWith("end-")) elems.length - 1 - t.stripPrefix("end-").toInt
      else t.toInt
    }
    val lo = math.max(0, resolve(first))
    val hi = math.min(elems.length - 1, resolve(last))
    if (lo > hi) "" else join(elems.slice(lo, hi + 1))
  }

  /** Tcl `dict get` with a key path; dict = flat k v list, nested dicts
    * are braced elements. Returns None if any key is missing/odd list. */
  def dictGet(dict: String, keys: Seq[String]): Option[String] =
    keys.zipWithIndex.foldLeft(Option(dict)) { case (cur, (key, lvl)) =>
      cur.flatMap { d =>
        val elems = if (lvl == 0) splitCached(d) else split(d)
        if (elems.length % 2 != 0) None
        else elems.grouped(2).collectFirst { case Vector(k, v) if k == key => v }
      }
    }

  def dictExists(dict: String, keys: Seq[String]): Boolean = dictGet(dict, keys).isDefined
}
