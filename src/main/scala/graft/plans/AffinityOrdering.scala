package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max, MaxBy, Min, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

/** SQLite cross-type ordering for affinity columns (SURVEY.md §1.3:
  * storage classes order NULL < INTEGER/REAL < TEXT < BLOB, numerics
  * comparing numerically — so `'2' < '10'`, and `min()` of
  * {'10','2','x'} is 2, where plain string sorting says otherwise).
  *
  * Spark has no per-value dynamic typing, so this cannot be expressed
  * with built-in operators alone: a custom optimizer rule rewrites
  *  - every ordering spec (Sort nodes, window ORDER BY, ordered
  *    aggregates) into ordering by the struct key
  *    `(numeric?0:1, numericValue, textValue)` (struct comparison is
  *    field-wise, NULL handling stays with SortOrder),
  *  - `min(col)` / `max(col)` into `min_by(col, key)` / `max_by`, and
  *  - string inequalities between affinity operands into key
  *    comparisons —
  * for exactly those StringType operands that RecordPipeline marked
  * (attribute metadata, or the [[AffinityValue]] wrapper once pushdown
  * substitutes the attribute away). Everything else is untouched, so
  * the rule is a no-op outside sqawk-shaped tables. Verified against
  * sqlite3: ORDER BY gives NULL, 2, 2.5, 9, 10, 'B', 'a', 'x'.
  *
  * SCOPE LIMIT: the inequality rewrite only fires when each side is an
  * affinity column or a FOLDABLE string expression. An affinity column
  * compared to a computed string (`a1 < upper(a2)`) or to another
  * table's plain string column in a join predicate keeps Spark's
  * memcmp string ordering, where SQLite would apply storage-class
  * ordering; `BETWEEN`/`IN`/`greatest`/`least` over affinity columns
  * are likewise untouched. Collated INEQUALITIES (`a1 < 'B' COLLATE
  * NOCASE`) keep Spark's collated string comparison without the
  * storage-class tier (collated ORDER BY is handled — see sortKey).
  * Those shapes don't occur in the reference suite; widening the
  * match to arbitrary non-foldable string operands would rewrite
  * comparisons on unrelated tables wherever one side is an affinity
  * column, which is unsafe without per-expression provenance, so the
  * narrower contract is deliberate.
  *
  * Registered via `spark.experimental.extraOptimizations` (it must run
  * after analysis; it only reshapes expressions, never plan structure,
  * so optimizer placement is safe).
  */
object AffinityOrdering extends Rule[LogicalPlan] {

  /** Metadata key RecordPipeline sets on numeric-affinity columns. */
  val AffinityKey = "graft.affinity"

  private val NumericRe = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  private def isAffinityAttr(e: Expression): Boolean = e match {
    case a: AttributeReference =>
      a.dataType == StringType && a.metadata.contains(AffinityKey)
    case AffinityValue(_, _) => true // survives pushdown substitution
    case _ => false
  }

  /** The cross-type key for expression builders outside this rule
    * (scalar min/max in GraftFunctions). */
  private[graft] def sortKeyFor(a: Expression): Expression = sortKey(a)

  /** `(rank, numeric, text)` sort key; NULL input stays NULL so the
    * SortOrder's null ordering applies (SQLite: NULL first ASC).
    * `collation` (from an `a1 COLLATE NOCASE` spelling) applies to the
    * TEXT component only — SQLite's storage-class ordering is not
    * affected by the collation, which only refines text-vs-text
    * comparison (sqlite3-pinned: '10','b','A','2' ORDER BY c COLLATE
    * NOCASE → 2, 10, A, b). */
  private def sortKey(a: Expression, collation: Option[Expression] = None): Expression = {
    val trimmed = RegExpReplace(a, Literal("^[\\x00-\\x20]+|[\\x00-\\x20]+$"), Literal(""))
    val isNum = RLike(trimmed, Literal(NumericRe))
    val num = Cast(trimmed, DoubleType, None, EvalMode.TRY)
    val text = If(isNum, Literal(""), a)
    val textKey = collation.map(c => Collate(text, c)).getOrElse(text)
    val key = CreateNamedStruct(Seq(
      Literal("r"), If(isNum, Literal(0, IntegerType), Literal(1, IntegerType)),
      Literal("n"), If(isNum, num, Literal(0.0, DoubleType)),
      Literal("t"), textKey))
    If(IsNull(a), Literal.create(null, key.dataType), key)
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    plan.transformAllExpressions {
      // every ordering spec — Sort nodes, window ORDER BY, ordered
      // aggregates — sorts by the cross-type key
      case so: SortOrder if isAffinityAttr(so.child) =>
        so.copy(child = sortKey(so.child))
      // `affinityCol COLLATE x`: storage-class ordering still applies,
      // the collation refines only the text component
      case so: SortOrder if (so.child match {
            case Collate(a, _) => isAffinityAttr(a)
            case _ => false
          }) =>
        val Collate(a, coll) = so.child
        so.copy(child = sortKey(a, Some(coll)))
      case ae @ AggregateExpression(Min(a), _, _, _, _) if isAffinityAttr(a) =>
        ae.copy(aggregateFunction = MinBy(a, sortKey(a)))
      case ae @ AggregateExpression(Max(a), _, _, _, _) if isAffinityAttr(a) =>
        ae.copy(aggregateFunction = MaxBy(a, sortKey(a)))
      // Inequalities where BOTH sides are strings and at least one is
      // an affinity column compare by the cross-type key ('9' < '10',
      // numeric < text). Mixed string-vs-numeric comparisons keep
      // Spark's numeric coercion (they arrive Cast-wrapped and don't
      // match). Equality needs no rewrite: canonicalization already
      // makes equal storage values string-identical.
      case c @ LessThan(l, r) if comparableAffinityPair(l, r) =>
        LessThan(sortKey(l), sortKey(r))
      case c @ LessThanOrEqual(l, r) if comparableAffinityPair(l, r) =>
        LessThanOrEqual(sortKey(l), sortKey(r))
      case c @ GreaterThan(l, r) if comparableAffinityPair(l, r) =>
        GreaterThan(sortKey(l), sortKey(r))
      case c @ GreaterThanOrEqual(l, r) if comparableAffinityPair(l, r) =>
        GreaterThanOrEqual(sortKey(l), sortKey(r))
    }
  }

  private def comparableAffinityPair(l: Expression, r: Expression): Boolean =
    l.dataType == StringType && r.dataType == StringType &&
      (isAffinityAttr(l) || isAffinityAttr(r)) &&
      (isAffinityAttr(l) || l.foldable) && (isAffinityAttr(r) || r.foldable)
}
