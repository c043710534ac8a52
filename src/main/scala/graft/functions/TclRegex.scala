package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

/** Tcl ARE (advanced regular expression) → `java.util.regex` shim.
  *
  * The reference's `regexp`/`regsub` SQLite functions delegate to Tcl's
  * regex engine (reference: sqawk-dev.tcl:199-215), whose dialect —
  * Henry Spencer's ARE, documented in re_syntax(n) — differs from
  * Java's in a few user-visible ways this translator bridges:
  *
  *   - word-boundary escapes: `\m` (word start), `\M` (word end),
  *     `\y` (boundary), `\Y` (non-boundary) → Java lookaround/`\b`/`\B`;
  *   - `\Z` means absolute end-of-string in ARE → Java `\z`
  *     (Java's own `\Z` stops before a final newline);
  *   - embedded option directors at the start of the RE —
  *     `(?i)(?c)(?n)(?m)(?p)(?w)(?s)(?x)(?t)(?q)(?e)(?b)` — ARE allows
  *     them only as a prefix, and several (`c n p w t q`) have no Java
  *     spelling, so they are parsed off and mapped to compile flags;
  *   - `***=` / `***:` directors (literal-string / force-ARE);
  *   - POSIX classes `[[:alpha:]]` etc. inside bracket expressions →
  *     Java `\p{...}` equivalents;
  *   - by default ARE's `.` matches newline (Tcl has no un-DOTALL'd
  *     mode; newline-sensitivity is opt-in via `(?n)`/`-line`), so the
  *     base compile flags include DOTALL, and `(?n)`/`(?p)` remove it.
  *
  * Unbridged (documented deviation): `(?b)` — "rest is a BASIC RE" —
  * is vanishingly rare and BRE syntax is structurally different; the
  * body is passed through as-is. Constraint escapes inside bracket
  * expressions are illegal in ARE and are likewise passed through.
  *
  * Patterns are compiled once per distinct (pattern, flags) pair and
  * cached: in a query the pattern is almost always a literal, so the
  * per-row cost drops from a full `Pattern.compile` to one map read.
  * The cache is cleared past a size cap so computed-pattern workloads
  * cannot grow it without bound.
  */
object TclRegex {

  /** Base flags: ARE `.` matches newline; classes/`\w`/case folding are
    * Unicode-aware like Tcl's engine. */
  private val BaseFlags =
    Pattern.DOTALL | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS

  private val MaxCache = 10000
  private val cache = new ConcurrentHashMap[String, Pattern]()

  /** Compile a Tcl ARE, translating to Java syntax. Cached. */
  def compile(re: String): Pattern = {
    val cached = cache.get(re)
    if (cached != null) return cached
    val p = translateAndCompile(re)
    if (cache.size >= MaxCache) cache.clear()
    cache.put(re, p)
    p
  }

  private val posixClasses: Map[String, String] = Map(
    "alpha" -> "\\p{Alpha}", "digit" -> "\\p{Digit}", "alnum" -> "\\p{Alnum}",
    "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}", "space" -> "\\p{Space}",
    "blank" -> "\\p{Blank}", "punct" -> "\\p{Punct}", "graph" -> "\\p{Graph}",
    "print" -> "\\p{Print}", "cntrl" -> "\\p{Cntrl}", "xdigit" -> "\\p{XDigit}",
    "word" -> "\\w")

  private def translateAndCompile(re0: String): Pattern = {
    var re = re0
    var flags = BaseFlags

    // Directors (re_syntax: only recognized at the very start).
    if (re.startsWith("***=")) // remainder is a literal string
      return Pattern.compile(Pattern.quote(re.substring(4)), flags)
    if (re.startsWith("***:")) // force-ARE director; ARE is our default
      re = re.substring(4)

    // Embedded options: a leading `(?abc)` where every char is a
    // letter (a letter-only body distinguishes it from Java groups
    // like `(?:` / `(?=`, which ARE spells the same way).
    if (re.startsWith("(?")) {
      val close = re.indexOf(')')
      if (close > 2 && re.substring(2, close).forall(_.isLetter)) {
        val opts = re.substring(2, close)
        re = re.substring(close + 1)
        // all letters of the director apply before 'q' takes effect
        // (regcomp parses the whole director, so (?qi) == (?iq))
        var quote = false
        opts.foreach {
          case 'i' => flags |= Pattern.CASE_INSENSITIVE
          case 'c' => flags &= ~Pattern.CASE_INSENSITIVE
          case 'n' | 'm' => // newline-sensitive: both `.` and anchors
            flags &= ~Pattern.DOTALL; flags |= Pattern.MULTILINE
          case 'p' => flags &= ~Pattern.DOTALL // partial: `.` only
          case 'w' => flags |= Pattern.MULTILINE // inverse partial: anchors only
          case 's' => flags |= Pattern.DOTALL // non-newline-sensitive (default)
          case 'x' => flags |= Pattern.COMMENTS // expanded syntax
          case 't' => flags &= ~Pattern.COMMENTS // tight syntax (default)
          case 'q' => quote = true // remainder is a literal string
          case 'e' | 'b' => // ERE/BRE syntax levels: pass body through
          case other =>
            throw new IllegalArgumentException(
              s"regexp: unknown embedded option '$other' in '$re0'")
        }
        if (quote) return Pattern.compile(Pattern.quote(re), flags)
      }
    }

    Pattern.compile(translateBody(re), flags)
  }

  /** Rewrite ARE-only escapes outside bracket expressions and POSIX
    * classes inside them; everything else passes through verbatim. */
  private def translateBody(re: String): String = {
    val sb = new StringBuilder(re.length + 8)
    var i = 0
    while (i < re.length) {
      re.charAt(i) match {
        case '\\' if i + 1 < re.length =>
          re.charAt(i + 1) match {
            case 'm' => sb.append("\\b(?=\\w)")
            case 'M' => sb.append("\\b(?<=\\w)")
            case 'y' => sb.append("\\b")
            case 'Y' => sb.append("\\B")
            case 'Z' => sb.append("\\z")
            case c => sb.append('\\').append(c)
          }
          i += 2
        case '[' =>
          i = appendBracket(re, i, sb)
        case c =>
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Copy a bracket expression starting at `from` (the `[`), rewriting
    * embedded `[:class:]` atoms; returns the index after the closing
    * `]`. ARE quirks honored: a `]` immediately after `[` or `[^` is a
    * literal member, and backslash escapes ARE members inside brackets
    * (unlike POSIX, Tcl honors `\]` — same as Java). */
  private def appendBracket(re: String, from: Int, sb: StringBuilder): Int = {
    var i = from
    sb.append('['); i += 1
    if (i < re.length && re.charAt(i) == '^') { sb.append('^'); i += 1 }
    if (i < re.length && re.charAt(i) == ']') { sb.append("\\]"); i += 1 }
    while (i < re.length && re.charAt(i) != ']') {
      re.charAt(i) match {
        case '\\' if i + 1 < re.length =>
          sb.append('\\').append(re.charAt(i + 1)); i += 2
        case '[' if i + 1 < re.length && re.charAt(i + 1) == ':' =>
          val close = re.indexOf(":]", i + 2)
          if (close < 0) { sb.append("\\["); i += 1 }
          else {
            val name = re.substring(i + 2, close)
            sb.append(posixClasses.getOrElse(name,
              throw new IllegalArgumentException(
                s"regexp: unknown character class [:$name:]")))
            i = close + 2
          }
        case '[' => sb.append("\\["); i += 1 // literal [ inside brackets
        case '&' if i + 1 < re.length && re.charAt(i + 1) == '&' =>
          sb.append("\\&\\&"); i += 2 // Java-only && intersection: literal in ARE
        case c => sb.append(c); i += 1
      }
    }
    if (i < re.length) { sb.append(']'); i += 1 }
    i
  }
}
