package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** SQLite's printf()/format() (printf.c semantics, the subset scripts
  * use — sqlite3-pinned in CliSpec): per-DIRECTIVE argument coercion
  * (`%d` of 3.7 is 3, of '5x' is 5 — the longest-numeric-prefix rule,
  * where Java's Formatter throws), C-style `%g` (trailing zeros
  * stripped: '%g' of 1024.0 is '1024'), `%c` as first character of
  * the text argument, and the SQLite extensions `%q` (single-quote
  * doubling), `%Q` (quoted, NULL → the literal NULL) and `%w`
  * (double-quote doubling). NULL arguments render as 0 / empty
  * string rather than nulling the whole result. Arguments arrive as
  * canonical SQLite text (the builder wraps them in SqliteCastText),
  * so numeric rendering is already SQLite-style before coercion. */
object SqlitePrintf {

  private val Directive =
    """%([-+ #0]*)([0-9]*)(\.[0-9]+)?([diouxXfeEgGscqQw%])""".r

  def run(fmt: UTF8String, args: Array[String]): UTF8String = {
    if (fmt == null) return null
    val f = fmt.toString
    val out = new StringBuilder
    var last = 0
    var argIdx = 0
    def nextArg(): String = {
      val a = if (argIdx < args.length) args(argIdx) else null
      argIdx += 1
      a
    }
    for (m <- Directive.findAllMatchIn(f)) {
      out.append(f.substring(last, m.start))
      last = m.end
      val (flags, width, prec, conv) =
        (m.group(1), m.group(2), Option(m.group(3)).getOrElse(""), m.group(4))
      def spec(c: Char) = "%" + flags + width + prec + c
      conv match {
        case "%" => out.append('%')
        case "d" | "i" =>
          val v = SqliteSum.coerce(Option(nextArg()).getOrElse("")) match {
            case (_, _, Some(l)) => l
            case (d, _, None) => d.toLong
          }
          out.append(("%" + flags + width + "d").format(v))
        case "o" | "x" | "X" | "u" =>
          val v = SqliteSum.coerce(Option(nextArg()).getOrElse("")) match {
            case (_, _, Some(l)) => l
            case (d, _, None) => d.toLong
          }
          val c = if (conv == "u") 'd' else conv.head
          out.append(("%" + flags + width + c).format(v))
        case "f" | "e" | "E" =>
          val v = SqliteSum.coerce(Option(nextArg()).getOrElse("")) ._1
          out.append(spec(conv.head).format(v))
        case "g" | "G" =>
          val v = SqliteSum.coerce(Option(nextArg()).getOrElse(""))._1
          var s = spec(conv.head).format(v)
          // C %g strips trailing mantissa zeros; Java keeps them
          val eIdx = s.indexWhere(c => c == 'e' || c == 'E')
          val (mant, exp) =
            if (eIdx >= 0) (s.substring(0, eIdx), s.substring(eIdx)) else (s, "")
          val stripped =
            if (mant.contains('.'))
              mant.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
            else mant
          out.append(stripped + exp)
        case "s" =>
          out.append(spec('s').format(Option(nextArg()).getOrElse("")))
        case "c" =>
          val a = Option(nextArg()).getOrElse("")
          out.append(spec('s').format(if (a.isEmpty) "" else a.substring(0, 1)))
        case "q" =>
          out.append(Option(nextArg()).getOrElse("").replace("'", "''"))
        case "Q" =>
          nextArg() match {
            case null => out.append("NULL")
            case a => out.append("'" + a.replace("'", "''") + "'")
          }
        case "w" =>
          out.append(Option(nextArg()).getOrElse("").replace("\"", "\"\""))
      }
    }
    out.append(f.substring(last))
    UTF8String.fromString(out.toString)
  }

  private def s(u: UTF8String): String = if (u == null) null else u.toString

  // per-arity static entry points for StaticInvoke (fmt + 0..8 args)
  def printf1(f: UTF8String): UTF8String = run(f, Array())
  def printf2(f: UTF8String, a: UTF8String): UTF8String = run(f, Array(s(a)))
  def printf3(f: UTF8String, a: UTF8String, b: UTF8String): UTF8String =
    run(f, Array(s(a), s(b)))
  def printf4(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String): UTF8String =
    run(f, Array(s(a), s(b), s(c)))
  def printf5(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String,
      d: UTF8String): UTF8String = run(f, Array(s(a), s(b), s(c), s(d)))
  def printf6(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String,
      d: UTF8String, e: UTF8String): UTF8String =
    run(f, Array(s(a), s(b), s(c), s(d), s(e)))
  def printf7(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String,
      d: UTF8String, e: UTF8String, g: UTF8String): UTF8String =
    run(f, Array(s(a), s(b), s(c), s(d), s(e), s(g)))
  def printf8(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String,
      d: UTF8String, e: UTF8String, g: UTF8String, h: UTF8String): UTF8String =
    run(f, Array(s(a), s(b), s(c), s(d), s(e), s(g), s(h)))
  def printf9(f: UTF8String, a: UTF8String, b: UTF8String, c: UTF8String,
      d: UTF8String, e: UTF8String, g: UTF8String, h: UTF8String,
      i: UTF8String): UTF8String =
    run(f, Array(s(a), s(b), s(c), s(d), s(e), s(g), s(h), s(i)))
}
