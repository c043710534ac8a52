package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQLite dynamic arithmetic (`+ - * / %`) for the script dialect
  * (sqlite.org/lang_expr.html §6; the reference forwards scripts
  * verbatim to SQLite, lib/classes/sqawk.tcl:216, so script
  * arithmetic must follow SQLite's per-VALUE typing, which Spark's
  * static column types cannot express):
  *
  *  - each operand converts by NUMERIC affinity: TEXT takes its
  *    longest numeric prefix (none → INTEGER 0), INTEGER/REAL pass
  *    through (a decimal literal like `5.0` is REAL — its lexical
  *    form, not its value, decides);
  *  - int⊗int stays INTEGER — `+ - *` fall back to REAL on int64
  *    overflow (SQLite redoes overflowing integer math as float),
  *    `/` TRUNCATES toward zero; any REAL operand makes the result
  *    REAL;
  *  - `%` casts both operands to INTEGER (saturating truncation from
  *    REAL) but yields REAL if either operand was REAL (5.5 % 2 →
  *    1.0);
  *  - `/ 0` and `% 0` are NULL (both integer and real in SQLite),
  *    NULL operands propagate, and a NaN result collapses to NULL.
  *
  * The result is the engine's canonical dynamic-value TEXT ("8" for
  * INTEGER, "2.5"/"8.0" via the SQLite real formatter for REAL), so
  * nesting reparses losslessly: integer text re-converts to INTEGER,
  * real text (always carrying `.`/`e`) to REAL — exactly SQLite's
  * type propagation. Serialization prints the canonical text as-is,
  * which is what sqlite3 prints.
  *
  * CodegenFallback: this expression exists only in the CLI script
  * dialect (statement-at-a-time, driver-pumped rows), never in the
  * library's analytic operators, so interpreted eval is fine.
  */
case class SqliteArithExpr(opExpr: Expression, left: Expression,
    right: Expression) extends TernaryExpression with CodegenFallback {

  override def first: Expression = opExpr
  override def second: Expression = left
  override def third: Expression = right
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sqlite_arith"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(opExpr = newFirst, left = newSecond, right = newThird)

  override protected def nullSafeEval(opV: Any, l: Any, r: Any): Any =
    SqliteArithExpr.compute(opV.toString.charAt(0),
      SqliteArithExpr.toNum(l), SqliteArithExpr.toNum(r))
}

/** Canonical dynamic-value TEXT of any scalar — the wrapper the
  * script dialect puts around CASE/coalesce/IF branch VALUES so
  * SQLite's per-row dynamic typing survives Spark's static branch
  * coercion: `CASE WHEN p THEN 0 ELSE 0.5 END` must yield INTEGER 0
  * on the one branch and REAL 0.5 on the other (Spark would unify
  * both to DOUBLE and print 0.0 — round-7 fuzz seed 391). Strings
  * pass through, so double-wrapping is harmless. CodegenFallback:
  * script dialect only. */
case class SqliteDynText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sqlite_dyntext"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => s
    case d: Double  => UTF8String.fromString(graft.sources.Affinity.formatReal(d))
    case f: Float   => UTF8String.fromString(graft.sources.Affinity.formatReal(f.toDouble))
    case dec: Decimal =>
      if (dec.scale <= 0)
        try UTF8String.fromString(String.valueOf(dec.toLong))
        catch { case _: ArithmeticException =>
          UTF8String.fromString(graft.sources.Affinity.formatReal(dec.toDouble)) }
      else UTF8String.fromString(graft.sources.Affinity.formatReal(dec.toDouble))
    case b: Boolean => UTF8String.fromString(if (b) "1" else "0")
    case other      => UTF8String.fromString(String.valueOf(other))
  }
}

object SqliteArithExpr {

  /** A SQLite dynamic numeric: isReal, integer value (valid iff
    * !isReal), double value (always valid). */
  private type Num = (Boolean, Long, Double)

  private def toNum(v: Any): Num = v match {
    case s: UTF8String =>
      val (d, isReal, lo) = SqliteSum.coerce(s.toString)
      if (isReal) (true, 0L, d) else (false, lo.get, d)
    case l: Long    => (false, l, l.toDouble)
    case i: Int     => (false, i.toLong, i.toDouble)
    case s: Short   => (false, s.toLong, s.toDouble)
    case b: Byte    => (false, b.toLong, b.toDouble)
    case d: Double  => (true, 0L, d)
    case f: Float   => (true, 0L, f.toDouble)
    case dec: Decimal =>
      // lexical typing: a literal with a fraction mark (scale > 0,
      // e.g. `5.0`) is REAL in SQLite even when integral-valued
      if (dec.scale <= 0)
        try (false, dec.toLong, dec.toDouble)
        catch { case _: ArithmeticException => (true, 0L, dec.toDouble) }
      else (true, 0L, dec.toDouble)
    case b: Boolean => (false, if (b) 1L else 0L, if (b) 1.0 else 0.0)
    case other =>
      val (d, isReal, lo) = SqliteSum.coerce(String.valueOf(other))
      if (isReal) (true, 0L, d) else (false, lo.get, d)
  }

  private def intText(l: Long): UTF8String =
    UTF8String.fromString(String.valueOf(l))

  private def realText(d: Double): UTF8String =
    if (d.isNaN) null
    else UTF8String.fromString(graft.sources.Affinity.formatReal(d))

  /** Saturating REAL → INTEGER truncation (SQLite CAST rules), for
    * the `%` operand conversion. */
  private def toLongSat(n: Num): Long =
    if (!n._1) n._2
    else {
      val d = n._3
      if (d.isNaN) 0L
      else if (d >= Long.MaxValue.toDouble) Long.MaxValue
      else if (d <= Long.MinValue.toDouble) Long.MinValue
      else d.toLong
    }

  private def compute(op: Char, a: Num, b: Num): UTF8String = {
    val bothInt = !a._1 && !b._1
    op match {
      case '+' =>
        if (bothInt)
          try intText(Math.addExact(a._2, b._2))
          catch { case _: ArithmeticException => realText(a._3 + b._3) }
        else realText(a._3 + b._3)
      case '-' =>
        if (bothInt)
          try intText(Math.subtractExact(a._2, b._2))
          catch { case _: ArithmeticException => realText(a._3 - b._3) }
        else realText(a._3 - b._3)
      case '*' =>
        if (bothInt)
          try intText(Math.multiplyExact(a._2, b._2))
          catch { case _: ArithmeticException => realText(a._3 * b._3) }
        else realText(a._3 * b._3)
      case '/' =>
        if (bothInt) {
          if (b._2 == 0L) null
          else if (a._2 == Long.MinValue && b._2 == -1L)
            realText(-Long.MinValue.toDouble)
          else intText(a._2 / b._2) // Java long division truncates toward zero
        } else if (b._3 == 0.0) null
        else realText(a._3 / b._3)
      case '%' =>
        val y = toLongSat(b)
        if (y == 0L) null
        else {
          val m = toLongSat(a) % y
          if (a._1 || b._1) realText(m.toDouble) else intText(m)
        }
      case other =>
        throw new IllegalStateException(s"sqlite_arith: unknown op '$other'")
    }
  }
}
