package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, JoinedRow, NamedExpression, RowNumber, SortOrder, SpecificInternalRow, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Distributed global rank — the scalable plan for
  * `row_number() OVER (ORDER BY …)` with NO partition spec.
  *
  * Spark's WindowExec puts an empty-partition window into ONE task
  * (`WindowExec.requiredChildDistribution` = AllTuples): every row of
  * the table flows through a single partition to be ranked, which is
  * the measured factor-26 cliff on the i20 ingest row (0.85 → 19.1 s
  * for 26× rows — one task evaluates the storage-class sort key and
  * ranks 390k rows while 31 cores idle) and would be the defining
  * bottleneck at real scale. A global rank does not need AllTuples:
  * range-partition by the order key (Spark's OrderedDistribution —
  * the same exchange a global ORDER BY uses), sort within partitions,
  * count rows per partition with one lightweight job, and assign
  * `offset(partition) + localIndex + 1` — `RDD.zipWithIndex`'s scheme
  * expressed as a physical operator, fully parallel in both passes.
  *
  * Custom-operator tier (c) of SURVEY §7.3: the semantics cannot be
  * composed from built-in operators (no logical node exposes
  * partition-offset arithmetic), so it is a LogicalPlan + Rule +
  * Strategy + SparkPlan chain registered via experimental hooks.
  *
  * Scope guard: the rewrite fires ONLY for a Window whose expression
  * list is exactly one `row_number()` over an empty partition spec
  * with a non-empty ORDER BY. rank()/dense_rank() need tie awareness
  * across partition boundaries and keep WindowExec; ties under
  * row_number are interchangeable by definition (sqlite and Spark
  * both leave the tie order unspecified), and the fuzz grammar's
  * determinism rules already require tied rows to be textually
  * identical. row_number's IntegerType (2^31 bound) is Spark's own
  * contract for the function, unchanged here.
  */
case class GlobalRank(
    rankAttr: AttributeReference,
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRank =
    copy(child = newChild)
}

/** Optimizer rule: single-row_number global Window → [[GlobalRank]].
  * Runs from `experimental.extraOptimizations` (after the analyzer,
  * and after [[AffinityOrdering]] has rewritten affinity ORDER BY
  * keys into storage-class structs — the struct key range-partitions
  * like any orderable type). */
object GlobalRankRewrite extends Rule[LogicalPlan] {
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Window(Seq(al @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(Seq(), order, _)), _)),
        Seq(), _, child, _) if order.nonEmpty =>
      GlobalRank(
        AttributeReference(al.name, IntegerType, nullable = false)(
          exprId = al.exprId, qualifier = al.qualifier),
        order, child)
  }
}

/** Plans [[GlobalRank]] into [[GlobalRankExec]]. */
object GlobalRankStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRank(rankAttr, order, child) =>
      GlobalRankExec(rankAttr, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Range-partitioned, per-partition-offset global rank.
  *
  * Pass 1 (lightweight): count rows of every partition but the last
  * (`sparkContext.runJob` over the sorted child — the shuffle files
  * written by the range exchange are reused, so the recount replays
  * only the local sorts). Pass 2: stream each partition, appending
  * `offset + i + 1`. Output ordering/partitioning are the child's, so
  * a parent global sort on the same key is satisfied without another
  * exchange. */
case class GlobalRankExec(
    rankAttr: AttributeReference,
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val input = child.execute()
    val n = input.getNumPartitions
    // counts for partitions 0 .. n-2 (the last partition's count is
    // never an offset); empty input short-circuits to a plain map
    val counts: Array[Long] =
      if (n <= 1) Array.empty
      else sparkContext.runJob(input, (it: Iterator[InternalRow]) => {
        var c = 0L
        while (it.hasNext) { it.next(); c += 1 }
        c
      }, 0 until n - 1)
    val offsets: Array[Long] = counts.scanLeft(0L)(_ + _)
    val attrs = output
    input.mapPartitionsWithIndex { (pi, it) =>
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      val rankRow = new SpecificInternalRow(Seq(IntegerType))
      var idx = if (pi < offsets.length) offsets(pi) else 0L
      it.map { r =>
        idx += 1L
        rankRow.setInt(0, idx.toInt)
        proj(joined(r, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
