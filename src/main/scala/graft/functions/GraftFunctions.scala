package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalaUDF}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Compatibility scalar functions the reference registers into SQLite
  * (reference: sqawk-dev.tcl:199-215, behavior pinned by
  * tests.tcl:1108-1156), re-expressed for Spark SQL.
  *
  * Fixed-arity functions go through the public `spark.udf.register`.
  * Tcl's `lindex`/`dict get`/`regsub` are variadic, which plain Spark
  * UDF registration cannot express, so those are registered as Catalyst
  * function builders that pick a [[ScalaUDF]] of the right arity at
  * analysis time. All are deterministic (the reference registers them
  * `-deterministic` too), so Catalyst may factor/common-subexpression
  * them freely.
  */
object GraftFunctions {

  /** Tcl `regexp RE STRING` → 1 if RE matches anywhere, else 0. */
  def tclRegexp(re: String, s: String): Int =
    if (re == null || s == null) 0
    else if (Pattern.compile(re).matcher(s).find()) 1 else 0

  /** Convert a Tcl regsub replacement spec to a Java one:
    * `&` → whole match, `\N` → group N; `$` and stray `\` escaped. */
  private def tclSubSpecToJava(spec: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < spec.length) {
      spec.charAt(i) match {
        case '&' => sb.append("$0"); i += 1
        case '\\' if i + 1 < spec.length =>
          val c = spec.charAt(i + 1)
          if (c.isDigit) sb.append('$').append(c)
          else if (c == '&') sb.append('&')
          else sb.append(Matcher.quoteReplacement(c.toString))
          i += 2
        case '$' => sb.append("\\$"); i += 1
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Tcl `regsub ?-all? RE STRING SUBSPEC` → substituted string.
    * Default replaces the FIRST match only (unlike Spark's always-all
    * `regexp_replace`), `-all` replaces every match. */
  def tclRegsub(all: Boolean, re: String, s: String, spec: String): String =
    if (re == null || s == null || spec == null) null
    else {
      val m = Pattern.compile(re).matcher(s)
      val j = tclSubSpecToJava(spec)
      if (all) m.replaceAll(j) else m.replaceFirst(j)
    }

  /** SQLite `glob(PATTERN, STRING)` → 0/1; `*`, `?`, `[...]` wildcards,
    * case-sensitive (unlike LIKE). */
  def sqliteGlob(pattern: String, s: String): Int = {
    if (pattern == null || s == null) return 0
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          val close = pattern.indexOf(']', i + 2) // "[]" literal ] first
          if (close < 0) { sb.append("\\["); }
          else {
            var cls = pattern.substring(i + 1, close)
            if (cls.startsWith("^")) cls = "\\^" + cls.drop(1)
            if (cls.startsWith("!")) cls = "^" + cls.drop(1)
            sb.append('[').append(cls).append(']')
            i = close
          }
        case c if "\\.^$|+(){}".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    if (Pattern.compile("^" + sb.toString + "$", Pattern.DOTALL).matcher(s).matches()) 1 else 0
  }

  /** Register every compat function on the session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    // SQLite cross-type ordering for affinity columns; experimental
    // rules apply to any session, including ones not built by
    // GraftSession (tests). Guarded for idempotence.
    if (!spark.experimental.extraOptimizations.contains(graft.plans.AffinityOrdering))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AffinityOrdering
    val u = spark.udf
    u.register("regexp", (re: String, s: String) => tclRegexp(re, s))
    u.register("glob", (p: String, s: String) => sqliteGlob(p, s))
    u.register("llength", (l: String) => if (l == null) null else Int.box(TclList.llength(l)))
    u.register("lrange", (l: String, a: String, b: String) =>
      if (l == null) null else TclList.lrange(l, a, b))
    u.register("sqlite_version", () => "3.45.0")

    registerVariadic(spark, "lindex", StringType) { args =>
      TclList.lindex(args.head, args.tail.map(_.trim.toInt))
    }
    registerVariadic(spark, "dict_get", StringType) { args =>
      TclList.dictGet(args.head, args.tail).orNull
    }
    registerVariadic(spark, "dict_exists", IntegerType) { args =>
      if (TclList.dictExists(args.head, args.tail)) Int.box(1) else Int.box(0)
    }
    // regsub: 3-arg = first-match, 4-arg with leading "-all" = global
    // (Tcl regsub switch semantics, tests.tcl:1126-1132).
    registerVariadic(spark, "regsub", StringType) { args =>
      if (args.length >= 4 && args.head == "-all") tclRegsub(all = true, args(1), args(2), args(3))
      else if (args.length >= 4) tclRegsub(all = false, args(1), args(2), args(3))
      else tclRegsub(all = false, args(0), args(1), args(2))
    }
  }

  /** Run `body` with SQLite-semantic `sum`/`total` shadowing the
    * built-ins, restoring them afterwards. The shadow must be scoped to
    * SCRIPT execution only: in this Spark version even the DataFrame
    * API's `functions.sum` resolves by name through the session
    * registry, so a session-global shadow would silently change every
    * library query in the session. */
  def withSqliteAggregates[T](spark: SparkSession)(body: => T): T = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val registry = spark.sessionState.functionRegistry
    val ids = Seq("sum", "total").map(n => FunctionIdentifier(n))
    val saved = ids.map(id =>
      (id, registry.lookupFunction(id), registry.lookupFunctionBuilder(id)))
    spark.udf.register("sum", org.apache.spark.sql.functions.udaf(SqliteSum))
    spark.udf.register("total", org.apache.spark.sql.functions.udaf(SqliteTotal))
    try body
    finally saved.foreach {
      case (id, Some(info), Some(builder)) => registry.registerFunction(id, info, builder)
      case (id, _, _) => registry.dropFunction(id)
    }
  }

  /** Register a variadic string-args function as a Catalyst builder:
    * at analysis time we instantiate a [[ScalaUDF]] whose arity matches
    * the call site. All arguments are coerced to string. */
  private def registerVariadic(spark: SparkSession, name: String, out: DataType)(
      f: Seq[String] => Any): Unit = {
    val builder: Seq[Expression] => Expression = { children =>
      val n = children.length
      val fn: AnyRef = n match {
        case 1 => (a: String) => f(Seq(a))
        case 2 => (a: String, b: String) => f(Seq(a, b))
        case 3 => (a: String, b: String, c: String) => f(Seq(a, b, c))
        case 4 => (a: String, b: String, c: String, d: String) => f(Seq(a, b, c, d))
        case 5 => (a: String, b: String, c: String, d: String, e: String) => f(Seq(a, b, c, d, e))
        case 6 => (a: String, b: String, c: String, d: String, e: String, g: String) =>
          f(Seq(a, b, c, d, e, g))
        case _ => throw new IllegalArgumentException(s"$name: unsupported arity $n")
      }
      ScalaUDF(
        function = fn,
        dataType = out,
        children = children,
        inputEncoders = Seq.fill(n)(Option(ExpressionEncoder[String]())),
        outputEncoder = None,
        udfName = Some(name),
        nullable = true,
        udfDeterministic = true)
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
