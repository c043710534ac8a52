package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAlias
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Between, Cast, Divide, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, Multiply, Not, Remainder, SortOrder, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, Sort}
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{SqliteArithExpr, SqliteDynText}

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

  /** SQLite truthiness on a CASE WHEN condition: any operand coerces
    * through REAL, nonzero = true (`CASE WHEN 1` takes the branch;
    * NULL and 'abc' do not — round 8: trigger bodies write these).
    * Booleans pass through SqliteCastReal as 1.0/0.0, so wrapping an
    * already-boolean predicate is a no-op in value terms. */
  private def truthy(p: Expression): Expression =
    Not(EqualTo(graft.functions.SqliteCastReal(p), Literal(0.0)))

  private val arithRewrite: PartialFunction[Expression, Expression] = {
    // BETWEEN survives analysis as a RuntimeReplaceable node that the
    // storage-class comparison rewrite cannot see into (its >=/<=
    // pair only appears during optimization, after the post-analysis
    // fixup ran) — desugar it here so the pair gets the affinity
    // matrix like any hand-written comparison (fuzz seed 179:
    // `a BETWEEN -1 AND 1` must be FALSE for REAL -1.25, not the
    // int-cast TRUE)
    case Between(v, lower, upper, _) =>
      And(GreaterThanOrEqual(v, lower), LessThanOrEqual(v, upper))
    // the parser can also spell it as the unresolved `between(v,l,u)`
    // function (CatalystSqlParser.parseExpression does)
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.map(_.toLowerCase(java.util.Locale.ROOT)) ==
          Seq("between") && f.arguments.size == 3 =>
      And(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
        LessThanOrEqual(f.arguments(0), f.arguments(2)))
    case Add(l, r, _)       => SqliteArithExpr(opLit("+"), l, r)
    case Subtract(l, r, _)  => SqliteArithExpr(opLit("-"), l, r)
    case Multiply(l, r, _)  => SqliteArithExpr(opLit("*"), l, r)
    case Divide(l, r, _)    => SqliteArithExpr(opLit("/"), l, r)
    case Remainder(l, r, _) => SqliteArithExpr(opLit("%"), l, r)
    // conditional VALUE positions keep per-row dynamic typing via the
    // canonical-text wrapper — Spark's branch unification would merge
    // INTEGER 0 and REAL 0.5 into DOUBLE (fuzz seed 391); strings
    // pass through the wrapper, so re-wrapping nested branches is
    // harmless
    case cw: org.apache.spark.sql.catalyst.expressions.CaseWhen =>
      cw.copy(
        branches = cw.branches.map { case (p, v) => (truthy(p), SqliteDynText(v)) },
        elseValue = cw.elseValue.map(SqliteDynText))
    case c: org.apache.spark.sql.catalyst.expressions.Coalesce =>
      c.copy(children = c.children.map(SqliteDynText))
    case i: org.apache.spark.sql.catalyst.expressions.If =>
      i.copy(trueValue = SqliteDynText(i.trueValue),
        falseValue = SqliteDynText(i.falseValue))
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

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(c, _)              => c
    case UnresolvedAlias(c, _)    => c
    case _                        => e
  }

  /** `ORDER BY <ordinal>` referring to an arithmetic output column
    * must also order numerically (fuzz seed 6: "12" sorted before
    * "5"). Resolved here at parse level — the analyzer would bind the
    * ordinal to the string-typed alias, past the point where the
    * numeric cast can be injected. */
  private def resolveOrdinals(plan: LogicalPlan): LogicalPlan =
    plan.transformDownWithSubqueries {
      case s @ Sort(order, _, child, _) =>
        val outs: Option[Seq[Expression]] = child match {
          case p: Project   => Some(p.projectList.map(stripAlias))
          case a: Aggregate => Some(a.aggregateExpressions.map(stripAlias))
          case _            => None
        }
        s.copy(order = order.map { so =>
          val ordinal: Option[Int] = so.child match {
            case Literal(i: Int, IntegerType) => Some(i)
            case org.apache.spark.sql.catalyst.analysis.UnresolvedOrdinal(i) =>
              Some(i)
            case _ => None
          }
          ordinal match {
            case Some(i) if outs.exists(o => i >= 1 && i <= o.size) =>
              outs.get(i - 1) match {
                case e: SqliteArithExpr => so.copy(child = Cast(e, DoubleType))
                case _ => so
              }
            case _ => so
          }
        })
    }

  def rewritePlan(plan: LogicalPlan): LogicalPlan = {
    // UnresolvedWith is a UnaryNode: its CTE DEFINITIONS are not plan
    // children, so the generic expression transforms below never
    // visit them — arithmetic inside `WITH w AS (SELECT a+b …)` kept
    // Spark's double/NULL typing while the outer query got the
    // dialect (round-11 fuzz seeds 109/175/180/302/345/391, all one
    // root cause). Rewrite each definition recursively first, exactly
    // like inlineViews walks them explicitly.
    // WITH RECURSIVE definitions are left alone: the STRING-typed
    // dialect arithmetic in the recursive leg (x+1) cannot type-merge
    // with the anchor under UnionLoop's set-operation widening
    // (CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE) — recursive bodies keep
    // Spark typing, as they did before this rewrite existed.
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}
    val withCtes = plan.transformDownWithSubqueries {
      case w: UnresolvedWith if !w.allowRecursion =>
        w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
          (n, rewritePlan(s).asInstanceOf[SubqueryAlias], o)
        })
    }
    resolveOrdinals(
      withCtes.transformAllExpressionsWithSubqueries(arithRewrite)
        .transformAllExpressionsWithSubqueries(sortRewrite))
  }

  /** Pre-analysis VIEW inlining (round 9): a script temp VIEW stores
    * its TEXT and re-resolves at use — but Spark's analyzer expands it
    * from that text AFTER [[rewritePlan]] ran, so nothing inside a
    * view body got the dialect rewrite (arithmetic inside `CREATE VIEW
    * v AS SELECT a*100 …` kept Spark's double typing: 100.0 where
    * sqlite3 prints 100). Expand view references ourselves before
    * analysis: each reference becomes a SubqueryAlias over the parsed
    * body, recursively (nested views), with CTE names shadowing views
    * (sqlite scoping) and a depth guard for circular definitions. */
  private def inlineViews(spark: SparkSession, plan: LogicalPlan,
      shadow: Set[String], depth: Int): LogicalPlan = {
    if (depth > 16)
      throw new IllegalArgumentException("view nesting too deep (circularly defined?)")
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    def viewText(name: String): Option[String] =
      spark.sessionState.catalog.getRawTempView(name)
        .flatMap(_.tableMeta.viewText)
    val node = plan match {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
          !shadow.contains(u.multipartIdentifier.head.toLowerCase) =>
        viewText(u.multipartIdentifier.head) match {
          case Some(text) =>
            val body = spark.sessionState.sqlParser.parsePlan(text)
            // nested views resolve in a fresh scope (outer CTEs are
            // not visible inside a view body, like sqlite)
            SubqueryAlias(u.multipartIdentifier.head,
              inlineViews(spark, body, Set.empty, depth + 1))
          case None => u
        }
      case w: UnresolvedWith =>
        val shadowed = shadow ++ w.cteRelations.map(_._1.toLowerCase)
        w.copy(
          child = inlineViews(spark, w.child, shadowed, depth),
          cteRelations = w.cteRelations.map { case (n, s, opt) =>
            (n, inlineViews(spark, s, shadowed, depth).asInstanceOf[SubqueryAlias], opt)
          })
      case other =>
        other.mapChildren(inlineViews(spark, _, shadow, depth))
    }
    node.transformExpressions {
      case s: SubqueryExpression =>
        s.withNewPlan(inlineViews(spark, s.plan, shadow, depth))
    }
  }

  /** `spark.sql` for a script statement, with the dialect rewrite.
    * After analysis, ORDER BY over computed value-provenance
    * expressions gets the storage-class sort key (the analyzed plan
    * still has the Sort directly over the SELECT's projection — the
    * optimizer may collapse it into union branches, too late). */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(text)
    fixup(spark, org.apache.spark.sql.GraftSqlShim.ofRows(spark,
      rewritePlan(inlineViews(spark, plan, Set.empty, 0))))
  }

  /** Apply the post-analysis script rewrites (storage-class
    * comparison keys, computed-sort keys) to an already-built
    * DataFrame — used both by [[sql]] and by ScriptDdl's
    * DataFrame-API DML paths (UPDATE/UPSERT rebinds), whose WHERE
    * conditions otherwise depend on the optimizer-rule pass that
    * union pushdown can defeat. */
  def fixup(spark: SparkSession, df: DataFrame): DataFrame = {
    val analyzed0 = df.queryExecution.analyzed
    // Inline CTE definitions BEFORE the computed-sort rewrite (round
    // 14, VERDICT r13 #3): an ORDER BY over a CTE-computed
    // mixed-storage projection needs the per-branch key injected at
    // the defining Project, which a CTERelationRef's fixed output
    // hides. alwaysInline = true inlines EVERY non-recursive def —
    // including multi-reference ones, whose subplans then duplicate
    // per reference (plan-size growth the collapse/codegen policy
    // absorbs, and re-evaluation of nondeterministic defs per
    // reference — the fuzz grammar never puts random() in a CTE).
    // That trade is deliberate (ADVICE r14 #1): a multi-reference
    // def behind a CTERelationRef would silently fall back to the
    // per-value-key ORDER BY approximation, the exact divergence
    // class r13 #3 fixed; paying plan bytes beats a wrong sort.
    // Recursive defs stay un-inlined. No-op for CTE-free plans.
    val analyzed =
      if (analyzed0.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.WithCTE]))
        org.apache.spark.sql.catalyst.optimizer.InlineCTE(alwaysInline = true)(analyzed0)
      else analyzed0
    val fixed = graft.plans.AffinityOrdering.rewriteScriptPlan(analyzed)
    if (fixed eq analyzed0) df
    else org.apache.spark.sql.GraftSqlShim.ofRows(spark, fixed)
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
