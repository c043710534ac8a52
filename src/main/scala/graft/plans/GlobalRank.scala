package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BaseOrdering, DenseRank, Expression, JoinedRow, NamedExpression, Rank, RowNumber, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Distributed global rank — the scalable plan for
  * `row_number() / rank() / dense_rank() OVER (ORDER BY …)` with NO
  * partition spec.
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
  * collect per-partition counts with one lightweight job, and assign
  * `offset(partition) + localIndex + 1` — `RDD.zipWithIndex`'s scheme
  * expressed as a physical operator, fully parallel in both passes.
  *
  * rank()/dense_rank() (round 15, VERDICT r14 #2) ride the same two
  * passes with tie awareness: the lightweight job additionally
  * returns, per partition, the local distinct-key count, the
  * first/last order-key values and the length of the trailing tie
  * group; a driver-side chain walk ([[GlobalRankExec.chainWalk]])
  * turns those into each partition's starting rank/dense-rank,
  * correct even when one tie group spans several partitions. (Under
  * Spark's RangePartitioning equal keys co-locate, so the spanning
  * case needs a pathological partitioning — but the walk costs
  * nothing and makes the operator correct under ANY partitioning
  * that satisfies OrderedDistribution, e.g. a reused upstream
  * exchange on a prefix of the key.)
  *
  * Custom-operator tier (c) of SURVEY §7.3: the semantics cannot be
  * composed from built-in operators (no logical node exposes
  * partition-offset arithmetic), so it is a LogicalPlan + Rule +
  * Strategy + SparkPlan chain registered via experimental hooks.
  *
  * Scope guard: the rewrite fires ONLY for a Window whose expression
  * list is exactly one rank-like function over an empty partition
  * spec with a non-empty ORDER BY. Ties under row_number are
  * interchangeable by definition (sqlite and Spark both leave the
  * tie order unspecified), and the fuzz grammar's determinism rules
  * already require tied rows to be textually identical. The rank
  * functions' IntegerType (2^31 bound) is Spark's own contract,
  * unchanged here. percent_rank/cume_dist/ntile need the total or a
  * look-ahead group length and keep WindowExec.
  */
case class GlobalRank(
    rankAttr: AttributeReference,
    order: Seq[SortOrder],
    func: GlobalRankFunc,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRank =
    copy(child = newChild)
}

/** Which rank-like function a [[GlobalRank]] computes. */
sealed trait GlobalRankFunc
case object RowNumberFunc extends GlobalRankFunc
case object RankFunc extends GlobalRankFunc
case object DenseRankFunc extends GlobalRankFunc

/** Optimizer rule: single rank-like global Window → [[GlobalRank]].
  * Runs from `experimental.extraOptimizations` (after the analyzer,
  * and after [[AffinityOrdering]] has rewritten affinity ORDER BY
  * keys into storage-class structs — the struct key range-partitions
  * like any orderable type). */
object GlobalRankRewrite extends Rule[LogicalPlan] {
  private def funcOf(e: Expression): Option[GlobalRankFunc] = e match {
    case _: RowNumber => Some(RowNumberFunc)
    case _: Rank      => Some(RankFunc)
    case _: DenseRank => Some(DenseRankFunc)
    case _            => None
  }
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Window(Seq(al @ Alias(
          WindowExpression(rf, WindowSpecDefinition(Seq(), order, _)), _)),
        Seq(), _, child, _) if order.nonEmpty && funcOf(rf).isDefined =>
      GlobalRank(
        AttributeReference(al.name, IntegerType, nullable = false)(
          exprId = al.exprId, qualifier = al.qualifier),
        order, funcOf(rf).get, child)
  }
}

/** Plans [[GlobalRank]] into [[GlobalRankExec]]. */
object GlobalRankStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRank(rankAttr, order, func, child) =>
      GlobalRankExec(rankAttr, order, func, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Per-partition summary returned by the rank/dense_rank lightweight
  * pass: row count, local distinct-key count, trailing-tie-group
  * length, and the first/last order-key rows (UnsafeRow copies —
  * small: just the key columns). Empty partitions hold nulls. */
case class GlobalRankPartStats(
    count: Long, distinct: Long, tailTie: Long,
    firstKey: UnsafeRow, lastKey: UnsafeRow)

object GlobalRankExec {
  /** Driver-side chain walk: per-partition starting rank and
    * dense-rank from the partition summaries. A tie group that spans
    * a partition boundary (last key of one partition order-equal to
    * the first key of the next) keeps the rank/dense-rank assigned
    * where the group began. Pure function, spec-pinned directly. */
  def chainWalk(stats: Array[GlobalRankPartStats], keyOrd: BaseOrdering)
      : (Array[Long], Array[Long], Array[Long]) = {
    val n = stats.length
    val offsets = stats.map(_.count).scanLeft(0L)(_ + _)
    val headRank = new Array[Long](n)
    val headDense = new Array[Long](n)
    var openKey: UnsafeRow = null
    var openRank = 0L  // rank of the currently-open trailing tie group
    var openDense = 0L // dense rank of that group
    var distinctSoFar = 0L
    var pi = 0
    while (pi < n) {
      val st = stats(pi)
      if (st.count > 0) {
        val chained = openKey != null && keyOrd.compare(st.firstKey, openKey) == 0
        headRank(pi) = if (chained) openRank else offsets(pi) + 1
        headDense(pi) = if (chained) openDense else distinctSoFar + 1
        distinctSoFar += st.distinct - (if (chained) 1L else 0L)
        // the trailing group starts in THIS partition unless the whole
        // partition is one group that chained from the previous one
        if (!(chained && st.distinct == 1))
          openRank = offsets(pi) + st.count - st.tailTie + 1
        openDense = distinctSoFar
        openKey = st.lastKey
      }
      pi += 1
    }
    (offsets, headRank, headDense)
  }
}

/** Range-partitioned, per-partition-offset global rank.
  *
  * Pass 1 (lightweight): per-partition row counts — plus, for
  * rank/dense_rank, local distinct counts, boundary keys and
  * trailing-tie lengths — via `sparkContext.runJob` over the sorted
  * child (the shuffle files written by the range exchange are
  * reused, so the recount replays only the local sorts). Pass 2:
  * stream each partition, appending the rank from the partition's
  * offset (row_number) or the chain-walked starting rank plus local
  * tie-group tracking (rank/dense_rank). Output
  * ordering/partitioning are the child's, so a parent global sort on
  * the same key is satisfied without another exchange. */
case class GlobalRankExec(
    rankAttr: AttributeReference,
    order: Seq[SortOrder],
    func: GlobalRankFunc,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = func match {
    case RowNumberFunc => doRowNumber()
    case _             => doRankLike()
  }

  private def doRowNumber(): RDD[InternalRow] = {
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

  private def doRankLike(): RDD[InternalRow] = {
    val input = child.execute()
    val childAttrs = child.output
    val keyExprs: Seq[Expression] = order.map(_.child)
    val keyTypes = keyExprs.map(_.dataType)
    // equality under the sort order is direction- and null-order-
    // independent, so a natural ascending interpreted ordering over
    // the key types detects ties for ANY SortOrder combination
    def keyOrdering(): BaseOrdering =
      RowOrdering.createNaturalAscendingOrdering(keyTypes)
    val stats: Array[GlobalRankPartStats] =
      sparkContext.runJob(input, (it: Iterator[InternalRow]) => {
        val keyProj = UnsafeProjection.create(keyExprs, childAttrs)
        val ord = keyOrdering()
        var c = 0L; var d = 0L; var tail = 0L
        var firstKey: UnsafeRow = null
        var prevKey: UnsafeRow = null
        while (it.hasNext) {
          val k = keyProj(it.next())
          if (c == 0L) {
            firstKey = k.copy(); prevKey = firstKey; d = 1L; tail = 1L
          } else if (ord.compare(k, prevKey) != 0) {
            d += 1L; tail = 1L; prevKey = k.copy()
          } else tail += 1L
          c += 1L
        }
        GlobalRankPartStats(c, d, tail, firstKey, prevKey)
      })
    val (offsets, headRank, headDense) =
      GlobalRankExec.chainWalk(stats, keyOrdering())
    val dense = func == DenseRankFunc
    val attrs = output
    input.mapPartitionsWithIndex { (pi, it) =>
      val keyProj = UnsafeProjection.create(keyExprs, childAttrs)
      val ord = keyOrdering()
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      val rankRow = new SpecificInternalRow(Seq(IntegerType))
      val offs = offsets(pi)
      var local = 0L
      var cur = 0L
      var prevKey: UnsafeRow = null
      it.map { r =>
        val k = keyProj(r)
        if (local == 0L) {
          cur = if (dense) headDense(pi) else headRank(pi)
          prevKey = k.copy()
        } else if (ord.compare(k, prevKey) != 0) {
          cur = if (dense) cur + 1L else offs + local + 1L
          prevKey = k.copy()
        }
        local += 1L
        rankRow.setInt(0, cur.toInt)
        proj(joined(r, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
