package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Expression, Literal, Multiply, Remainder, SortOrder, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SqliteArithExpr

/** Script-dialect arithmetic rewrite: every `+ - * / %` in a script
  * statement becomes [[SqliteArithExpr]], giving SQLite's per-VALUE
  * dynamic typing (INTEGER results for int⊗int, truncating integer
  * division, `%` over integer casts, NULL on division by zero) that
  * closes the long-pinned "scalar arithmetic is double-typed"
  * deviation. The rewrite runs on the PARSED (pre-analysis) plan, so
  * it sees the author's raw operands before Spark's type coercion
  * inserts double casts — and it is invoked ONLY from the script
  * execution path (ScriptRunner / ScriptDdl), never for the library's
  * analytic queries, whose oracle is DuckDB semantics.
  *
  * Scope limits (documented, not silent): `-x` (unary minus) keeps
  * Spark typing — rewriting it would also capture negative literals
  * in positions like `LIMIT -1`; and an ORDER BY that references an
  * arithmetic RESULT through an output alias/ordinal falls back to
  * text ordering (a direct `ORDER BY a+b` is handled below).
  */
object SqliteArith {

  private def opLit(op: String): Expression =
    Literal(UTF8String.fromString(op), StringType)

  private val arithRewrite: PartialFunction[Expression, Expression] = {
    case Add(l, r, _)       => SqliteArithExpr(opLit("+"), l, r)
    case Subtract(l, r, _)  => SqliteArithExpr(opLit("-"), l, r)
    case Multiply(l, r, _)  => SqliteArithExpr(opLit("*"), l, r)
    case Divide(l, r, _)    => SqliteArithExpr(opLit("/"), l, r)
    case Remainder(l, r, _) => SqliteArithExpr(opLit("%"), l, r)
  }

  // a direct ORDER BY over an arithmetic result must order
  // NUMERICALLY (the canonical text is always numeric or NULL, so the
  // cast is total); without this, "10" would sort before "8"
  private val sortRewrite: PartialFunction[Expression, Expression] = {
    case so @ SortOrder(child: SqliteArithExpr, _, _, _) =>
      so.copy(child = Cast(child, DoubleType))
  }

  private def rewriteExpression(e: Expression): Expression =
    e.transformDown(arithRewrite).transformDown(sortRewrite)

  def rewritePlan(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries(arithRewrite)
      .transformAllExpressionsWithSubqueries(sortRewrite)

  /** `spark.sql` for a script statement, with the dialect rewrite. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(text)
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, rewritePlan(plan))
  }

  /** `functions.expr` for a script expression fragment (UPDATE SET /
    * WHERE bodies evaluated by ScriptDdl), with the dialect rewrite.
    * Session-free: the catalyst parser covers the full expression
    * grammar, so DDL helpers without a session handle still rewrite. */
  def expr(text: String): Column = {
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(text)
    org.apache.spark.sql.GraftSqlShim.column(rewriteExpression(parsed))
  }
}
