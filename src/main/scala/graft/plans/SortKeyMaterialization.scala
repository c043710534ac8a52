package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression, RLike, RegExpReplace, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialize expensive sort keys once per row (round 15, the i20
  * residual attribution, VERDICT r14 #1).
  *
  * Spark's SortExec evaluates each SortOrder child expression inside
  * the row comparator — O(n log n) evaluations per partition, and the
  * struct-typed first key defeats the radix/prefix fast path. The
  * [[AffinityOrdering]] storage-class key is a RegExpReplace → RLike →
  * TRY-cast CASE struct, so a 390k-row global sort at factor 26 spent
  * ~3 s per pass re-running regexes in the comparator (stage-level
  * attribution in SURVEY §8) — and [[GlobalRankExec]] pays the
  * reduce-side sort twice (stats pass + output pass).
  *
  * This rule rewrites any [[Sort]] or [[GlobalRank]] whose sort keys
  * contain a regex into
  * `Project(original output)(Sort(by key attr)(Project(output :+ key)))`
  * — the key is computed ONCE per row in the projection (whole-stage
  * codegen, map side of the range exchange), the comparator reads a
  * materialized struct field, and both of GlobalRank's passes reuse
  * it. Registered LAST in `experimental.extraOptimizations` (the
  * optimizer's final fixed-point batch, after AffinityOrdering has
  * rewritten affinity ORDER BYs and GlobalRankRewrite has planned
  * global ranks), so no later rule collapses the projection back.
  * Idempotent: rewritten keys are bare attributes, which the
  * expensive-key guard never matches. Scoped to regex-bearing keys —
  * the only expensive-comparator shape this engine generates — so
  * audited plans without affinity sorts are untouched. */
object SortKeyMaterialization extends Rule[LogicalPlan] {

  private def expensive(e: Expression): Boolean = e match {
    case _: Attribute => false
    case _ => e.exists {
      case _: RLike | _: RegExpReplace => true
      case _ => false
    }
  }

  /** Rewrite `order`: expensive keys become attributes of freshly
    * aliased key columns (deduplicated by canonicalized expression). */
  private def pullKeys(order: Seq[SortOrder])
      : (Seq[SortOrder], Seq[NamedExpression]) = {
    val keyed = scala.collection.mutable.LinkedHashMap[Expression, Alias]()
    val newOrder = order.map { so =>
      if (expensive(so.child)) {
        val al = keyed.getOrElseUpdate(so.child.canonicalized,
          Alias(so.child, s"__graft_sortkey${keyed.size}")())
        so.copy(child = al.toAttribute)
      } else so
    }
    (newOrder, keyed.values.toSeq)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s @ Sort(order, global, child, hint)
        if order.exists(so => expensive(so.child)) =>
      val (newOrder, keys) = pullKeys(order)
      Project(s.output,
        Sort(newOrder, global,
          Project((child.output ++ keys).toIndexedSeq, child), hint))

    case g @ GlobalRank(rankAttr, order, func, extra, child)
        if order.exists(so => expensive(so.child)) =>
      val (newOrder, keys) = pullKeys(order)
      Project(g.output,
        GlobalRank(rankAttr, newOrder, func, extra,
          Project((child.output ++ keys).toIndexedSeq, child)))
  }
}
