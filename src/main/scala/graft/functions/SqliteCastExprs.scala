package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQLite CAST semantics (sqlite.org/lang_expr.html §7), which differ
  * from Spark's in ways a script author relies on — pinned against
  * sqlite3 in CliSpec:
  *
  *  - text → INTEGER takes the longest `[+-]?digits` PREFIX ('12abc'
  *    → 12, '12.9' → 12, '1e2' → 1 — NOT the numeric value), 0 when
  *    there is none, saturating at the int64 range (Spark: null);
  *  - real → INTEGER truncates toward zero, saturating;
  *  - text → REAL takes the longest numeric prefix ('1.5e2q' → 150.0,
  *    'abc' → 0.0; Spark: null);
  *  - → TEXT renders reals SQLite-style ('1.0e+20', '12.0'), reusing
  *    the engine's canonical real formatter;
  *  - → NUMERIC canonicalizes like column affinity does (lossless
  *    reals collapse to integers), emitted as the canonical string the
  *    engine's dynamic values already use.
  *
  * The target type is static per plan, so each expression dispatches
  * on `child.dataType` AT CODEGEN TIME — the generated code is a
  * direct static call or a primitive cast, inside whole-stage codegen
  * (Scala objects expose static forwarders, so generated Java can call
  * [[SqliteCast]] directly). */
object SqliteCast {

  /** Longest integer prefix, saturating; no prefix → 0. */
  def textToInteger(s: UTF8String): Long = {
    val str = s.toString.trim
    val n = str.length
    var i = 0
    if (i < n && (str.charAt(i) == '+' || str.charAt(i) == '-')) i += 1
    var j = i
    while (j < n && str.charAt(j).isDigit) j += 1
    if (j == i) 0L
    else {
      val prefix = str.substring(0, j)
      try prefix.toLong
      catch {
        case _: NumberFormatException =>
          if (prefix.charAt(0) == '-') Long.MinValue else Long.MaxValue
      }
    }
  }

  /** Longest numeric prefix as a double; no prefix → 0.0. */
  def textToReal(s: UTF8String): Double =
    SqliteSum.coerce(s.toString)._1

  def realToText(d: Double): UTF8String =
    UTF8String.fromString(graft.sources.Affinity.formatReal(d))

  def longToText(l: Long): UTF8String =
    UTF8String.fromString(String.valueOf(l))

  /** Affinity-canonical string: what a NUMERIC-affinity column stores. */
  def textToNumeric(s: UTF8String): UTF8String =
    UTF8String.fromString(
      graft.sources.Affinity.canonicalize(s.toString, "NUMERIC"))
}

case class SqliteCastInteger(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sqlite_cast_integer"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => SqliteCast.textToInteger(v.asInstanceOf[UTF8String])
    case DoubleType    => v.asInstanceOf[Double].toLong
    case FloatType     => v.asInstanceOf[Float].toDouble.toLong
    case LongType      => v
    case IntegerType   => v.asInstanceOf[Int].toLong
    case ShortType     => v.asInstanceOf[Short].toLong
    case ByteType      => v.asInstanceOf[Byte].toLong
    case BooleanType   => if (v.asInstanceOf[Boolean]) 1L else 0L
    case _ => SqliteCast.textToInteger(UTF8String.fromString(String.valueOf(v)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.textToInteger($c)")
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType =>
        defineCodeGen(ctx, ev, c => s"(long) $c")
      case BooleanType =>
        defineCodeGen(ctx, ev, c => s"($c ? 1L : 0L)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.SqliteCast.textToInteger(UTF8String.fromString(String.valueOf($c)))")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SqliteCastReal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sqlite_cast_real"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => SqliteCast.textToReal(v.asInstanceOf[UTF8String])
    case DoubleType    => v
    case FloatType     => v.asInstanceOf[Float].toDouble
    case LongType      => v.asInstanceOf[Long].toDouble
    case IntegerType   => v.asInstanceOf[Int].toDouble
    case ShortType     => v.asInstanceOf[Short].toDouble
    case ByteType      => v.asInstanceOf[Byte].toDouble
    case BooleanType   => if (v.asInstanceOf[Boolean]) 1.0 else 0.0
    case _ => SqliteCast.textToReal(UTF8String.fromString(String.valueOf(v)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.textToReal($c)")
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType =>
        defineCodeGen(ctx, ev, c => s"(double) $c")
      case BooleanType =>
        defineCodeGen(ctx, ev, c => s"($c ? 1.0d : 0.0d)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.SqliteCast.textToReal(UTF8String.fromString(String.valueOf($c)))")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SqliteCastText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "sqlite_cast_text"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => v
    case DoubleType    => SqliteCast.realToText(v.asInstanceOf[Double])
    case FloatType     => SqliteCast.realToText(v.asInstanceOf[Float].toDouble)
    case LongType      => SqliteCast.longToText(v.asInstanceOf[Long])
    case IntegerType   => SqliteCast.longToText(v.asInstanceOf[Int].toLong)
    case ShortType     => SqliteCast.longToText(v.asInstanceOf[Short].toLong)
    case ByteType      => SqliteCast.longToText(v.asInstanceOf[Byte].toLong)
    case BooleanType   => SqliteCast.longToText(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case _ => UTF8String.fromString(String.valueOf(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => c)
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.realToText((double) $c)")
      case LongType | IntegerType | ShortType | ByteType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.longToText((long) $c)")
      case BooleanType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.longToText($c ? 1L : 0L)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"UTF8String.fromString(String.valueOf($c))")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SqliteCastNumeric(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "sqlite_cast_numeric"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => SqliteCast.textToNumeric(v.asInstanceOf[UTF8String])
    case DoubleType    => SqliteCast.textToNumeric(SqliteCast.realToText(v.asInstanceOf[Double]))
    case FloatType     => SqliteCast.textToNumeric(SqliteCast.realToText(v.asInstanceOf[Float].toDouble))
    case LongType      => SqliteCast.longToText(v.asInstanceOf[Long])
    case IntegerType   => SqliteCast.longToText(v.asInstanceOf[Int].toLong)
    case ShortType     => SqliteCast.longToText(v.asInstanceOf[Short].toLong)
    case ByteType      => SqliteCast.longToText(v.asInstanceOf[Byte].toLong)
    case BooleanType   => SqliteCast.longToText(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case _ => SqliteCast.textToNumeric(UTF8String.fromString(String.valueOf(v)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.textToNumeric($c)")
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.SqliteCast.textToNumeric(graft.functions.SqliteCast.realToText((double) $c))")
      case LongType | IntegerType | ShortType | ByteType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.longToText((long) $c)")
      case BooleanType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SqliteCast.longToText($c ? 1L : 0L)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.SqliteCast.textToNumeric(UTF8String.fromString(String.valueOf($c)))")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
