package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, BaseOrdering, CumeDist, DenseRank, Expression, JoinedRow, Lag, Lead, Literal, NTile, NamedExpression, PercentRank, Rank, RowNumber, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
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
  * Scope guard: the rewrite fires ONLY for a Window whose expressions
  * are ALL rank-family functions over an empty partition spec with a
  * non-empty shared ORDER BY. Round 16 (VERDICT r15 #8): same-spec
  * rank functions collapse into one multi-expression Window, which
  * used to stay on single-task WindowExec; such a node now plans as a
  * chain of GlobalRank operators sharing one range exchange (each
  * preserves child partitioning/ordering, so EnsureRequirements adds
  * nothing between them). A Window mixing rank-family and other
  * expressions keeps WindowExec. The integer functions keep Spark's
  * own IntegerType (2^31) contract. */
case class GlobalRank(
    rankAttr: AttributeReference,
    order: Seq[SortOrder],
    func: GlobalRankFunc,
    extra: Seq[Expression],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRank =
    copy(child = newChild)
}

/** Which rank-family function a [[GlobalRank]] computes. Offset
  * functions (lag/lead) carry their value and default expressions in
  * the node's `extra` field: Seq(input, default). */
sealed trait GlobalRankFunc
case object RowNumberFunc extends GlobalRankFunc
case object RankFunc extends GlobalRankFunc
case object DenseRankFunc extends GlobalRankFunc
case object PercentRankFunc extends GlobalRankFunc
case object CumeDistFunc extends GlobalRankFunc
case class NTileFunc(buckets: Int) extends GlobalRankFunc
case class OffsetFunc(n: Int, lead: Boolean) extends GlobalRankFunc

/** Optimizer rule: single rank-family global Window → [[GlobalRank]].
  * Runs from `experimental.extraOptimizations` (after the analyzer,
  * and after [[AffinityOrdering]] has rewritten affinity ORDER BY
  * keys into storage-class structs — the struct key range-partitions
  * like any orderable type). */
object GlobalRankRewrite extends Rule[LogicalPlan] {
  private def funcOf(e: Expression): Option[(GlobalRankFunc, Seq[Expression])] = e match {
    case _: RowNumber   => Some((RowNumberFunc, Nil))
    case _: Rank        => Some((RankFunc, Nil))
    case _: DenseRank   => Some((DenseRankFunc, Nil))
    case _: PercentRank => Some((PercentRankFunc, Nil))
    case _: CumeDist    => Some((CumeDistFunc, Nil))
    case NTile(Literal(b: Int, IntegerType)) if b > 0 => Some((NTileFunc(b), Nil))
    // frameless offset windows: literal non-negative offset, foldable
    // default, respecting-nulls only (IGNORE NULLS needs a variable-
    // depth scan back and keeps WindowExec)
    case Lag(in, Literal(n: Int, IntegerType), d, false) if n >= 0 && d.foldable =>
      Some((OffsetFunc(n, lead = false), Seq(in, d)))
    case Lead(in, Literal(n: Int, IntegerType), d, false) if n >= 0 && d.foldable =>
      Some((OffsetFunc(n, lead = true), Seq(in, d)))
    case _              => None
  }
  /** Every expression of a Window node decomposed, when ALL of them
    * are rank-family over the same empty-partition non-empty-order
    * spec (the order is read from the expressions' own specs, which
    * are equal by the analyzer's grouping) — None as soon as one is
    * not. */
  private def allRankLike(exprs: Seq[NamedExpression])
      : Option[Seq[(Alias, Expression, Seq[SortOrder], GlobalRankFunc, Seq[Expression])]] = {
    val hits = exprs.collect {
      case al @ Alias(WindowExpression(rf,
            WindowSpecDefinition(Seq(), o, _)), _)
          if o.nonEmpty && funcOf(rf).isDefined =>
        val (f, extra) = funcOf(rf).get
        (al, rf, o, f, extra)
    }
    if (hits.length == exprs.length && hits.nonEmpty &&
        hits.forall(_._3 == hits.head._3)) Some(hits)
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Round 16 (VERDICT r15 #8): the guard previously required exactly
    // ONE rank-family expression, so same-spec rank functions — which
    // the analyzer collapses into a single multi-expression Window —
    // fell back to WindowExec's single-task AllTuples shape, the very
    // cliff this operator exists to remove. A multi-expression Window
    // whose expressions are ALL rank-family over the same spec now
    // plans as a CHAIN of GlobalRank nodes: each preserves its child's
    // partitioning and ordering, so the whole chain shares the ONE
    // range exchange (EnsureRequirements sees OrderedDistribution
    // already satisfied) and each function keeps its own lightweight
    // summary pass. Mixed windows (any non-rank expression) still keep
    // WindowExec for the whole node.
    case Window(exprs, Seq(), _, child, _)
        if allRankLike(exprs).isDefined =>
      allRankLike(exprs).get.foldLeft(child) {
        case (c, (al, rf, order, f, extra)) =>
          GlobalRank(
            AttributeReference(al.name, rf.dataType, nullable = rf.nullable)(
              exprId = al.exprId, qualifier = al.qualifier),
            order, f, extra, c)
      }
  }
}

/** Plans [[GlobalRank]] into [[GlobalRankExec]]. */
object GlobalRankStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRank(rankAttr, order, func, extra, child) =>
      GlobalRankExec(rankAttr, order, func, extra, planLater(child)) :: Nil
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
    extra: Seq[Expression],
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
    case RowNumberFunc          => doRowNumber()
    case NTileFunc(k)           => doNTile(k)
    case OffsetFunc(n, lead)    => doOffset(n, lead)
    case _                      => doRankLike()
  }

  /** Global lag/lead: pass 1 returns each partition's row count plus
    * its boundary input VALUES (last ≤n for lag, first ≤n for lead —
    * a handful of scalar-wide UnsafeRows per partition); the driver
    * chains them into each partition's ≤n-value prefix (lag) or
    * suffix (lead), and pass 2 streams rows with an n-deep ring
    * buffer (lag) or n-row lookahead queue (lead). No AllTuples, no
    * whole-partition buffering. */
  private def doOffset(n: Int, lead: Boolean): RDD[InternalRow] = {
    val input = child.execute()
    val childAttrs = child.output
    val inExpr = extra.head
    val dt = inExpr.dataType
    val defaultVal: Any = extra(1).eval(InternalRow.empty)
    val numParts = input.getNumPartitions
    // pass 1: (count, boundary input values)
    val stats: Array[(Long, Array[UnsafeRow])] =
      if (n == 0) Array.fill(numParts)((0L, Array.empty[UnsafeRow]))
      else sparkContext.runJob(input, (it: Iterator[InternalRow]) => {
        val proj = UnsafeProjection.create(Seq(inExpr), childAttrs)
        var c = 0L
        if (lead) {
          val buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
          while (it.hasNext) {
            val r = it.next()
            if (c < n) buf += proj(r).copy()
            c += 1L
          }
          (c, buf.toArray)
        } else {
          val ring = new Array[UnsafeRow](n)
          while (it.hasNext) {
            ring((c % n).toInt) = proj(it.next()).copy()
            c += 1L
          }
          val m = math.min(c, n.toLong).toInt
          // oldest → newest
          val out = Array.tabulate(m)(i => ring(((c - m + i) % n).toInt))
          (c, out)
        }
      })
    // driver chain: the ≤n values immediately before (lag) / after
    // (lead) each partition, skipping empty partitions naturally
    val boundaries = new Array[Array[UnsafeRow]](numParts)
    if (!lead) {
      var carry = Vector.empty[UnsafeRow]
      var pi = 0
      while (pi < numParts) {
        boundaries(pi) = carry.toArray
        val (c, tail) = stats(pi)
        carry = if (c >= n) tail.toVector else (carry ++ tail).takeRight(n)
        pi += 1
      }
    } else {
      var carry = Vector.empty[UnsafeRow]
      var pi = numParts - 1
      while (pi >= 0) {
        boundaries(pi) = carry.toArray
        val (c, head) = stats(pi)
        carry = if (c >= n) head.toVector else (head.toVector ++ carry).take(n)
        pi -= 1
      }
    }
    val attrs = output
    input.mapPartitionsWithIndex { (pi, it) =>
      val proj = UnsafeProjection.create(attrs, attrs)
      val inProj = UnsafeProjection.create(Seq(inExpr), childAttrs)
      val joined = new JoinedRow
      val valRow = new SpecificInternalRow(Seq(dt))
      def emit(r: InternalRow, v: Any): InternalRow = {
        if (v == null) valRow.setNullAt(0) else valRow.update(0, v)
        proj(joined(r, valRow))
      }
      def valueOf(u: UnsafeRow): Any =
        if (u.isNullAt(0)) null else u.get(0, dt)
      if (n == 0) {
        // lag/lead 0 is the current row's value
        it.map(r => emit(r, valueOf(inProj(r))))
      } else if (!lead) {
        val prefix = boundaries(pi)
        val ring = new Array[UnsafeRow](n)
        var i = 0L
        it.map { r =>
          val v: Any =
            if (i >= n) valueOf(ring(((i - n) % n).toInt))
            else {
              val j = prefix.length - n + i.toInt
              if (j >= 0) valueOf(prefix(j)) else defaultVal
            }
          ring((i % n).toInt) = inProj(r).copy()
          i += 1L
          emit(r, v)
        }
      } else {
        val suffix = boundaries(pi)
        new Iterator[InternalRow] {
          private val pending = scala.collection.mutable.Queue.empty[InternalRow]
          private var flushIdx = 0
          private var streaming = true
          def hasNext: Boolean = {
            // fill the lookahead window until a row can be emitted
            while (streaming && pending.size <= n) {
              if (it.hasNext) pending += it.next().copy()
              else streaming = false
            }
            pending.nonEmpty
          }
          def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            if (pending.size > n) {
              // the incoming row n positions ahead supplies the value
              val v = valueOf(inProj(pending(n)))
              emit(pending.dequeue(), v)
            } else {
              // tail rows: values come from the chained suffix, then
              // the default. m rows remain; this one needs position
              // n - m + flushIdx′ of the suffix — but m shrinks as we
              // dequeue, so track with flushIdx against the original
              // remainder.
              val m = pending.size + flushIdx // original remainder
              val sIdx = n - m + flushIdx
              val v = if (sIdx < suffix.length) valueOf(suffix(sIdx)) else defaultVal
              flushIdx += 1
              emit(pending.dequeue(), v)
            }
          }
        }
      }
    }
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
