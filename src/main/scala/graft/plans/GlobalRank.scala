package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BaseOrdering, CumeDist, DenseRank, Expression, JoinedRow, Literal, NTile, NamedExpression, PercentRank, Rank, RowNumber, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Distributed global rank — the scalable plan for the rank-family
  * window functions (`row_number`, `rank`, `dense_rank`,
  * `percent_rank`, `cume_dist`, `ntile`) `OVER (ORDER BY …)` with NO
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
  * collect per-partition summaries with one lightweight job, and
  * assign from partition offsets — `RDD.zipWithIndex`'s scheme
  * expressed as a physical operator, fully parallel in both passes.
  *
  * Tie awareness (round 15, VERDICT r14 #2): for the tie-sensitive
  * functions the lightweight job additionally returns, per partition,
  * the local distinct-key count, the first/last order-key values and
  * the leading/trailing tie-run lengths; a driver-side chain walk
  * ([[GlobalRankExec.chainWalk]]) turns those into each partition's
  * starting rank/dense-rank and the global END index of its trailing
  * tie group, correct even when one tie group spans several
  * partitions. (Under Spark's RangePartitioning equal keys co-locate,
  * so the spanning case needs a pathological partitioning — but the
  * walk costs nothing and keeps the operator correct under ANY
  * partitioning that satisfies OrderedDistribution, e.g. a reused
  * upstream exchange on a prefix of the key.)
  *
  * Per-function plumbing on top of the shared two passes:
  *  - row_number: counts only (partitions 0..n-2), offset + local idx;
  *  - ntile(k): counts over ALL partitions (needs the total N), then
  *    the standard remainder split (first N mod k buckets one larger);
  *  - rank / dense_rank: chain-walked starting values + local
  *    tie-group tracking;
  *  - percent_rank: rank spelled as (rank − 1) / (N − 1);
  *  - cume_dist: group-end / N — interior tie groups buffer until
  *    their end index is known (bounded by the largest tie group in a
  *    partition — strictly less state than WindowExec's whole-input
  *    single-partition buffer), the trailing group streams with the
  *    chain-walked end.
  *
  * Custom-operator tier (c) of SURVEY §7.3: the semantics cannot be
  * composed from built-in operators (no logical node exposes
  * partition-offset arithmetic), so it is a LogicalPlan + Rule +
  * Strategy + SparkPlan chain registered via experimental hooks.
  *
  * Scope guard: the rewrite fires ONLY for a Window whose expression
  * list is exactly one rank-family function over an empty partition
  * spec with a non-empty ORDER BY (rank functions sharing one spec
  * collapse into a single multi-expression Window, which stays on
  * WindowExec). The integer functions keep Spark's own IntegerType
  * (2^31) contract. */
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

/** Which rank-family function a [[GlobalRank]] computes. */
sealed trait GlobalRankFunc
case object RowNumberFunc extends GlobalRankFunc
case object RankFunc extends GlobalRankFunc
case object DenseRankFunc extends GlobalRankFunc
case object PercentRankFunc extends GlobalRankFunc
case object CumeDistFunc extends GlobalRankFunc
case class NTileFunc(buckets: Int) extends GlobalRankFunc

/** Optimizer rule: single rank-family global Window → [[GlobalRank]].
  * Runs from `experimental.extraOptimizations` (after the analyzer,
  * and after [[AffinityOrdering]] has rewritten affinity ORDER BY
  * keys into storage-class structs — the struct key range-partitions
  * like any orderable type). */
object GlobalRankRewrite extends Rule[LogicalPlan] {
  private def funcOf(e: Expression): Option[GlobalRankFunc] = e match {
    case _: RowNumber   => Some(RowNumberFunc)
    case _: Rank        => Some(RankFunc)
    case _: DenseRank   => Some(DenseRankFunc)
    case _: PercentRank => Some(PercentRankFunc)
    case _: CumeDist    => Some(CumeDistFunc)
    case NTile(Literal(b: Int, IntegerType)) if b > 0 => Some(NTileFunc(b))
    case _              => None
  }
  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Window(Seq(al @ Alias(
          WindowExpression(rf, WindowSpecDefinition(Seq(), order, _)), _)),
        Seq(), _, child, _) if order.nonEmpty && funcOf(rf).isDefined =>
      GlobalRank(
        AttributeReference(al.name, rf.dataType, nullable = false)(
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

/** Per-partition summary returned by the tie-aware lightweight pass:
  * row count, local distinct-key count, leading/trailing tie-run
  * lengths, and the first/last order-key rows (UnsafeRow copies —
  * small: just the key columns). Empty partitions hold nulls. */
case class GlobalRankPartStats(
    count: Long, distinct: Long, headTie: Long, tailTie: Long,
    firstKey: UnsafeRow, lastKey: UnsafeRow)

object GlobalRankExec {
  /** Driver-side chain walk: per-partition starting rank and
    * dense-rank, plus the global END index (1-based position of the
    * group's last row) of each partition's trailing tie group, from
    * the partition summaries. A tie group that spans a partition
    * boundary (last key of one partition order-equal to the first key
    * of the next) keeps the rank/dense-rank assigned where the group
    * began, and its end is found where the chain breaks. Returns
    * (offsets[n+1] — offsets(n) is the total row count, headRank,
    * headDense, tailEnd). Pure function, spec-pinned directly. */
  def chainWalk(stats: Array[GlobalRankPartStats], keyOrd: BaseOrdering)
      : (Array[Long], Array[Long], Array[Long], Array[Long]) = {
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
    // reverse scan for trailing-group ends: if the next nonempty
    // partition starts with the same key, the group ends inside it
    // (after its leading tie run) — or further right when that
    // partition is entirely the same key (take ITS tail end).
    val tailEnd = new Array[Long](n)
    var nextIdx = -1 // next nonempty partition to the right
    pi = n - 1
    while (pi >= 0) {
      val st = stats(pi)
      if (st.count > 0) {
        tailEnd(pi) =
          if (nextIdx >= 0 &&
              keyOrd.compare(stats(nextIdx).firstKey, st.lastKey) == 0) {
            if (stats(nextIdx).distinct == 1) tailEnd(nextIdx)
            else offsets(nextIdx) + stats(nextIdx).headTie
          } else offsets(pi) + st.count
        nextIdx = pi
      }
      pi -= 1
    }
    (offsets, headRank, headDense, tailEnd)
  }
}

/** Range-partitioned, per-partition-offset global rank.
  *
  * Pass 1 (lightweight): per-partition row counts — plus, for the
  * tie-aware functions, local distinct counts, boundary keys and
  * leading/trailing tie-run lengths — via `sparkContext.runJob` over
  * the sorted child (the shuffle files written by the range exchange
  * are reused, so the recount replays only the local sorts). Pass 2:
  * stream each partition, appending the function value from the
  * partition's offset and the chain-walked boundary data. Output
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
    case NTileFunc(k)  => doNTile(k)
    case _             => doRankLike()
  }

  /** Counts for partitions `range`; one lightweight job, shuffle
    * files reused. */
  private def counts(input: RDD[InternalRow], range: Range): Array[Long] =
    sparkContext.runJob(input, (it: Iterator[InternalRow]) => {
      var c = 0L
      while (it.hasNext) { it.next(); c += 1 }
      c
    }, range)

  private def doRowNumber(): RDD[InternalRow] = {
    val input = child.execute()
    val n = input.getNumPartitions
    // counts for partitions 0 .. n-2 (the last partition's count is
    // never an offset); empty input short-circuits to a plain map
    val cs = if (n <= 1) Array.empty[Long] else counts(input, 0 until n - 1)
    val offsets: Array[Long] = cs.scanLeft(0L)(_ + _)
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

  private def doNTile(k: Int): RDD[InternalRow] = {
    val input = child.execute()
    val n = input.getNumPartitions
    val cs = counts(input, 0 until n) // ntile needs the total too
    val offsets: Array[Long] = cs.scanLeft(0L)(_ + _)
    val total = offsets(n)
    // standard remainder split: the first (total mod k) buckets hold
    // one row more than the rest
    val q = total / k
    val r = total % k
    val bigSpan = r * (q + 1)
    val attrs = output
    input.mapPartitionsWithIndex { (pi, it) =>
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      val rankRow = new SpecificInternalRow(Seq(IntegerType))
      var idx = offsets(pi) // 0-based global index
      it.map { row =>
        val tile =
          if (idx < bigSpan) idx / (q + 1)
          else r + (idx - bigSpan) / q
        idx += 1L
        rankRow.setInt(0, tile.toInt + 1)
        proj(joined(row, rankRow))
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
        var c = 0L; var d = 0L; var head = 0L; var tail = 0L
        var headOpen = true
        var firstKey: UnsafeRow = null
        var prevKey: UnsafeRow = null
        while (it.hasNext) {
          val k = keyProj(it.next())
          if (c == 0L) {
            firstKey = k.copy(); prevKey = firstKey
            d = 1L; head = 1L; tail = 1L
          } else if (ord.compare(k, prevKey) != 0) {
            d += 1L; tail = 1L; headOpen = false; prevKey = k.copy()
          } else {
            tail += 1L
            if (headOpen) head += 1L
          }
          c += 1L
        }
        GlobalRankPartStats(c, d, head, tail, firstKey, prevKey)
      })
    val (offsets, headRank, headDense, tailEnd) =
      GlobalRankExec.chainWalk(stats, keyOrdering())
    val total = offsets(offsets.length - 1)
    val attrs = output
    val f = func
    input.mapPartitionsWithIndex { (pi, it) =>
      val keyProj = UnsafeProjection.create(keyExprs, childAttrs)
      val ord = keyOrdering()
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      f match {
        case CumeDistFunc =>
          // group-at-a-time: interior groups buffer until the key
          // changes (their end index is then known); the trailing
          // group takes the chain-walked end
          val rankRow = new SpecificInternalRow(Seq(DoubleType))
          val offs = offsets(pi)
          val te = tailEnd(pi)
          new Iterator[InternalRow] {
            private var lookahead: InternalRow = null
            private var consumed = 0L
            private var emit: Iterator[InternalRow] = Iterator.empty
            private def refill(): Unit = {
              while (!emit.hasNext && (lookahead != null || it.hasNext)) {
                val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
                val first =
                  if (lookahead != null) lookahead
                  else { consumed += 1; it.next().copy() }
                lookahead = null
                val gKey = keyProj(first).copy()
                buf += first
                var closedEnd = -1L
                var done = false
                while (!done && it.hasNext) {
                  val r = it.next().copy(); consumed += 1
                  if (ord.compare(keyProj(r), gKey) == 0) buf += r
                  else { lookahead = r; closedEnd = offs + consumed - 1; done = true }
                }
                val end = if (closedEnd >= 0) closedEnd else te
                val cume = end.toDouble / total
                emit = buf.iterator.map { r =>
                  rankRow.setDouble(0, cume)
                  proj(joined(r, rankRow))
                }
              }
            }
            def hasNext: Boolean = { refill(); emit.hasNext }
            def next(): InternalRow = { refill(); emit.next() }
          }
        case _ =>
          val dense = f == DenseRankFunc
          val pct = f == PercentRankFunc
          val rankRow =
            new SpecificInternalRow(Seq(if (pct) DoubleType else IntegerType))
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
            if (pct)
              rankRow.setDouble(0,
                if (total <= 1L) 0.0 else (cur - 1).toDouble / (total - 1))
            else rankRow.setInt(0, cur.toInt)
            proj(joined(r, rankRow))
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
