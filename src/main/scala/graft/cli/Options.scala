package graft.cli

import graft.sources.TableOptions

/** CLI option grammar (reference: sqawk-dev.tcl:43-183).
  *
  * `sqawk [options] script [[setting=value ...] filename ...]` —
  * global flags first, then the SQL script, then per-file
  * `key=value` settings that accumulate until a filename (or `-`)
  * flushes one file entry.
  */
final case class GlobalOptions(
    fs: String = "[ \t]+",
    rs: String = "\n",
    ofs: String = " ",
    ors: String = "\n",
    nf: Int = 10,
    mnf: String = "expand",
    dbfile: String = ":memory:",
    noinput: Boolean = false,
    output: String = "awk")

/** One input file plus its merged per-file settings. */
final case class FileSpec(
    filename: String,
    format: String,
    options: Map[String, String])

final case class ParsedArgs(
    script: String,
    global: GlobalOptions,
    files: Vector[FileSpec])

object Options {

  val validFormats: Set[String] = Set("awk", "csv", "csv2", "csvalt", "json", "tcl")
  private val awkKeys = Set("FS", "RS")
  private val defaultKeys = Set("NF", "MNF")
  private val universalKeys = Set("columns", "datatypes", "F0", "header", "prefix", "table")
  private val perFormatKeys: Map[String, Set[String]] = Map(
    "awk" -> Set("FS", "RS", "fields", "trim"),
    "csv" -> Set("format", "csvsep", "csvquote"),
    "csv2" -> Set("format", "csvsep", "csvquote"),
    "csvalt" -> Set("format", "csvsep", "csvquote"),
    "json" -> Set("kv", "lines"),
    "tcl" -> Set("kv", "lines"))

  def parseBool(v: String): Boolean = v.toLowerCase match {
    case "1" | "true" | "yes" | "on" => true
    case "0" | "false" | "no" | "off" => false
    case other => throw new IllegalArgumentException(s"expected a boolean value but got $other")
  }

  /** Tcl-style backslash substitution for OFS/ORS values
    * (reference: sqawk-dev.tcl:86-93). */
  def backslashSubst(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'a' => sb.append(''); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'v' => sb.append(''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  def usage: String =
    """usage: sqawk [options] script [[setting=value ...] filename ...]
      | -FS value   Input field separator for all files (regexp) <[ \t]+>
      | -RS value   Input record separator for all files (regexp) <\n>
      | -OFS value  Output field separator < >
      | -ORS value  Output record separator <\n>
      | -NF value   Maximum NF value for all files <10>
      | -MNF value  NF mode (expand, crop or error) <expand>
      | -dbfile value  Persist tables as parquet under <value>.d for reuse <:memory:>
      | -noinput    Do not read from stdin when no filenames are given
      | -output value  Output format <awk>
      | -v          Print version
      | -1          One field only. A shortcut for -FS 'x^'""".stripMargin

  def parse(argv: Seq[String]): ParsedArgs = {
    if (argv.isEmpty || Set("-h", "-help", "--help", "-?", "/?").contains(argv.headOption.getOrElse("")))
      throw new UsageException(usage, if (argv.isEmpty) 1 else 0)

    var g = GlobalOptions()
    var rest = argv.toList
    var done = false
    while (!done && rest.nonEmpty && rest.head.startsWith("-") && rest.head.length > 1) {
      rest match {
        case "-FS" :: v :: t => g = g.copy(fs = v); rest = t
        case "-RS" :: v :: t => g = g.copy(rs = v); rest = t
        case "-OFS" :: v :: t => g = g.copy(ofs = backslashSubst(v)); rest = t
        case "-ORS" :: v :: t => g = g.copy(ors = backslashSubst(v)); rest = t
        case "-NF" :: v :: t => g = g.copy(nf = v.toInt); rest = t
        case "-MNF" :: v :: t => g = g.copy(mnf = v); rest = t
        case "-dbfile" :: v :: t => g = g.copy(dbfile = v); rest = t
        case "-noinput" :: t => g = g.copy(noinput = true); rest = t
        case "-output" :: v :: t => g = g.copy(output = v); rest = t
        case "-v" :: _ => throw new UsageException("sqawk-spark 0.1.0", 0)
        case "-1" :: t => g = g.copy(fs = "x^"); rest = t
        case "--" :: t => rest = t; done = true
        case other :: _ => throw new IllegalArgumentException(s"unknown option: $other")
        case Nil =>
      }
    }

    val script = rest.headOption.getOrElse(
      throw new UsageException(usage, 1))
    rest = rest.drop(1)

    // Per-file key=value accumulation until a filename flushes an
    // entry. Classification is by PATTERN only, like the reference's
    // `regexp {([^=]+)=(.*)}` (sqawk-dev.tcl:124): anything with a
    // non-empty key before '=' is a setting even if a file by that
    // name exists in cwd.
    val files = Vector.newBuilder[FileSpec]
    var current = Map.empty[String, String]
    var count = 0
    for (elem <- rest) {
      val kv = elem.split("=", 2)
      if (kv.length == 2 && kv(0).nonEmpty) {
        current += kv(0) -> kv(1)
      } else {
        if (!new java.io.File(elem).exists() && elem != "-")
          throw new IllegalArgumentException(s"can't find file $elem")
        files += makeSpec(elem, current, g, count)
        count += 1
        current = Map.empty
      }
    }
    var all = files.result()
    if (all.isEmpty && !g.noinput) {
      all = Vector(makeSpec("-", current, g, 0))
    }
    ParsedArgs(script, g, all)
  }

  private def makeSpec(
      filename: String, opts: Map[String, String], g: GlobalOptions, index: Int): FileSpec = {
    val format = opts.getOrElse("format", "awk")
    if (!validFormats.contains(format))
      throw new IllegalArgumentException(s"unknown input format: $format")
    val allowed = perFormatKeys(format) ++ universalKeys ++ defaultKeys ++
      (if (format == "awk") awkKeys else Set.empty[String])
    for (k <- opts.keys if k != "filename" && k != "format" && !allowed.contains(k))
      throw new IllegalArgumentException(s"unknown option $k for input format $format")
    FileSpec(filename, format, opts)
  }

  /** Default table names a..z by position (reference: sqawk.tcl:11). */
  def defaultTableName(index: Int): String =
    if (index < 26) ('a' + index).toChar.toString
    else s"t$index"

  /** Merge global + per-file options into the reader's TableOptions. */
  def tableOptions(spec: FileSpec, g: GlobalOptions, tableIndex: Int): TableOptions = {
    val table = spec.options.getOrElse("table", defaultTableName(tableIndex))
    TableOptions(
      table = table,
      prefix = spec.options.get("prefix"),
      nf = spec.options.get("NF").map(_.toInt).getOrElse(g.nf),
      mnf = spec.options.getOrElse("MNF", g.mnf),
      header = spec.options.get("header").exists(parseBool),
      columns = spec.options.get("columns")
        .map(v => if (v.isEmpty) Nil else v.split(",", -1).toSeq).getOrElse(Nil),
      datatypes = spec.options.get("datatypes")
        .map(_.split(",", -1).toSeq).getOrElse(Nil),
      f0 = spec.options.get("F0").forall(parseBool))
  }
}

final class UsageException(val message: String, val exitCode: Int)
    extends RuntimeException(message)
